"""Corpus snapshot diff vs a dict-based reference."""

import pyarrow as pa
import ray.data

from dedup_ray.ops.diff import corpus_diff


def _ds(rows, blocks=2):
    ids = [r[0] for r in rows]
    texts = [r[1] for r in rows]
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(blocks)


def test_statuses():
    old = _ds([(1, "a"), (2, "b"), (3, "c"), (4, None)])
    new = _ds([(2, "b"), (3, "c2"), (4, ""), (5, "e")], blocks=3)
    out = corpus_diff(old, new).to_pandas().sort_values("doc_id")
    got = dict(zip(out["doc_id"], out["status"]))
    # null text == empty page, so 4: None -> "" is SAME
    assert got == {1: "removed", 2: "same", 3: "changed",
                   4: "same", 5: "added"}


def test_disjoint_and_empty_sides():
    old = _ds([(1, "x")])
    new = _ds([(2, "y")])
    out = corpus_diff(old, new, num_partitions=4).to_pandas()
    got = dict(zip(out["doc_id"], out["status"]))
    assert got == {1: "removed", 2: "added"}
