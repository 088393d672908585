"""Distributed truncated suffix array (stages/suffix.py) vs a local
pure-python reference."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from dedup_ray.stages.suffix import (
    sa_repeat_coverage,
    suffix_array,
    suffix_prefix_words,
)


def _corpus():
    return pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "the quick brown fox jumps over the lazy dog",
            "a quick brown fox jumps over fences daily",
            "zz",
            "",
            None,
        ], pa.string()),
    })


def _local_ranks(table: pa.Table, depth: int, max_pos=None):
    """Reference: all (doc, pos, prefix) triples ranked by
    (prefix, doc, pos) with plain python sort."""
    rows = []
    for did, text in zip(table["doc_id"].to_pylist(),
                         table["text"].to_pylist()):
        t = text or ""
        n = len(t) if max_pos is None else min(len(t), max_pos)
        for p in range(n):
            rows.append((t[p:p + depth], did, p))
    rows.sort()
    return {(d, p): r for r, (_, d, p) in enumerate(rows)}


@pytest.mark.parametrize("depth", [8, 16])
def test_suffix_array_matches_local(ray_session, depth):
    tbl = _corpus()
    out = suffix_array(rd.from_arrow(tbl), depth=depth,
                       num_partitions=4).to_pandas()
    expected = _local_ranks(tbl, depth)
    got = {(d, p): r for d, p, r in
           zip(out["doc_id"], out["pos"], out["srank"])}
    assert got == expected
    # total order: ranks are a permutation
    assert sorted(out["srank"]) == list(range(len(expected)))


def test_suffix_array_partition_invariance(ray_session):
    tbl = _corpus()
    a = suffix_array(rd.from_arrow(tbl), num_partitions=1).to_pandas()
    b = suffix_array(rd.from_arrow(tbl), num_partitions=7).to_pandas()
    ka = a.sort_values(["doc_id", "pos"]).reset_index(drop=True)
    kb = b.sort_values(["doc_id", "pos"]).reset_index(drop=True)
    assert (ka == kb).all().all()


def test_suffix_array_max_pos_cap(ray_session):
    tbl = _corpus()
    out = suffix_array(rd.from_arrow(tbl), max_pos=5,
                       num_partitions=3).to_pandas()
    expected = _local_ranks(tbl, 16, max_pos=5)
    got = {(d, p): r for d, p, r in
           zip(out["doc_id"], out["pos"], out["srank"])}
    assert got == expected
    assert out["pos"].max() <= 4


def test_prefix_words_order_matches_string_order():
    # packed int64 word tuples must sort exactly like the byte strings
    tbl = pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["banana~Banana and a bandana!"], pa.string()),
    })
    words = suffix_prefix_words(tbl, "doc_id", "text", depth=16)
    w0 = words["w0"].to_numpy()
    w1 = words["w1"].to_numpy()
    pos = words["pos"].to_numpy()
    text = "banana~Banana and a bandana!"
    order_packed = np.lexsort((pos, w1, w0))
    order_str = sorted(range(len(pos)), key=lambda i: (text[i:i + 16], i))
    assert order_packed.tolist() == order_str


def test_sa_repeat_coverage_planted(ray_session):
    # doc 1 repeats doc 0's 24-char span: every position of the span
    # whose 16-prefix stays inside it is a duplicate in the LATER doc
    span = "exactly repeated span!!!"  # 24 chars
    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "unique prefix " + span,
            span + " unique suffix",
            "no repeats here at all",
        ], pa.string()),
    })
    out = sa_repeat_coverage(rd.from_arrow(tbl), depth=16,
                             num_partitions=3).to_pandas()
    out = out.set_index("doc_id").sort_index()
    assert out.loc[0, "n_pos"] == len("unique prefix " + span)
    # keep-first: doc 0 holds the first occurrences, doc 1 pays
    assert out.loc[0, "n_dup_pos"] == 0
    # positions 0..8 of doc 1 have their 16-gram inside the repeated span
    assert out.loc[1, "n_dup_pos"] == len(span) - 16 + 1
    assert out.loc[2, "n_dup_pos"] == 0


def test_suffix_array_empty_corpus(ray_session):
    tbl = pa.table({"doc_id": pa.array([], pa.int64()),
                    "text": pa.array([], pa.string())})
    out = suffix_array(rd.from_arrow(tbl), num_partitions=2).to_pandas()
    assert len(out) == 0
    cov = sa_repeat_coverage(rd.from_arrow(tbl),
                             num_partitions=2).to_pandas()
    assert len(cov) == 0
