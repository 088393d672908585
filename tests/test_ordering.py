"""Deterministic shuffle rank vs a driver brute force."""

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

from dedup_ray.stages.ordering import _hex2_to_int, shuffle_rank


def test_hex2_to_int():
    dg = ["00ab", "ff12", "9c00", "0a99"]
    assert _hex2_to_int(dg).tolist() == [0x00, 0xFF, 0x9C, 0x0A]


def _brute_ranks(ids, seed):
    keys = [hashlib.md5(f"{i}:{seed}".encode()).hexdigest() for i in ids]
    order = sorted(range(len(ids)), key=lambda j: (keys[j], ids[j]))
    rank = {}
    for pos, j in enumerate(order):
        rank[ids[j]] = pos
    return rank


def test_shuffle_rank_matches_brute_force():
    ids = list(range(300))
    ds = ray.data.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64())}))
    out = shuffle_rank(ds, seed=7, num_partitions=4).to_pandas()
    brute = _brute_ranks(ids, 7)
    got = dict(zip(out.doc_id, out["rank"]))
    assert got == brute
    # a permutation: every rank exactly once
    assert sorted(out["rank"].tolist()) == ids


def test_shuffle_rank_seed_changes_order():
    ids = list(range(64))
    ds = ray.data.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64())}))
    a = shuffle_rank(ds, seed=1, num_partitions=2).to_pandas()
    b = shuffle_rank(ds, seed=2, num_partitions=2).to_pandas()
    ra = dict(zip(a.doc_id, a["rank"]))
    rb = dict(zip(b.doc_id, b["rank"]))
    assert any(ra[i] != rb[i] for i in ids)
    # reruns reproduce exactly
    c = shuffle_rank(ds, seed=1, num_partitions=3).to_pandas()
    rc = dict(zip(c.doc_id, c["rank"]))
    assert ra == rc
