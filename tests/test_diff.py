"""Corpus snapshot diff vs a dict-based reference."""

import numpy as np
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


def test_psi_drift_identical_and_shifted():
    from dedup_ray.ops.diff import psi_drift

    rng = np.random.default_rng(47)
    base = rng.normal(10, 3, size=4000)
    same = ray.data.from_arrow(pa.table({"v": pa.array(base)}))
    shifted = ray.data.from_arrow(pa.table({"v": pa.array(base + 6.0)}))

    out_same = psi_drift(same, same, "v", lo=0.0, hi=25.0,
                         n_buckets=10).to_pandas()
    assert out_same["psi"].iloc[0] == 0.0
    assert len(out_same) == 10
    assert (out_same["n_a"] == out_same["n_b"]).all()

    out_shift = psi_drift(same, shifted, "v", lo=0.0, hi=25.0,
                          n_buckets=10).to_pandas()
    assert out_shift["psi"].iloc[0] > 0.25  # clearly shifted
    # totals preserved (clamping keeps every non-null row)
    assert out_shift["n_a"].sum() == 4000
    assert out_shift["n_b"].sum() == 4000
    # brute-force parity on the contribs
    wdt = 2.5
    na = np.bincount(np.clip((base // wdt).astype(int), 0, 9),
                     minlength=10)
    nb = np.bincount(np.clip(((base + 6.0) // wdt).astype(int), 0, 9),
                     minlength=10)
    pa_ = np.maximum(na / 4000, 1e-6)
    pb_ = np.maximum(nb / 4000, 1e-6)
    want = np.round((pa_ - pb_) * np.log(pa_ / pb_), 6)
    assert np.allclose(out_shift["contrib"].to_numpy(), want)
