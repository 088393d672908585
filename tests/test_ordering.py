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


# ---------------------------------------------------------------------------
# token_budget_select


def _brute_budget(rows, budget):
    """Brute force: sort (score DESC, id ASC), keep while cumsum <= budget."""
    order = sorted(rows, key=lambda r: (-r[1], r[0]))
    kept, cum = [], 0
    for rid, score, toks in order:
        if cum + toks > budget:
            break  # strict prefix of the order, like the SQL window
        cum += toks
        kept.append(rid)
    return sorted(kept)


def _select(rows, budget, parallelism=4):
    from dedup_ray.stages.ordering import token_budget_select

    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "score": pa.array([r[1] for r in rows], pa.int64()),
        "n_tokens": pa.array([r[2] for r in rows], pa.int64()),
    })
    ds = ray.data.from_arrow(t).repartition(parallelism)
    out = token_budget_select(ds, budget=budget).to_pandas()
    if "doc_id" not in out.columns:  # empty to_pandas drops columns
        assert out.empty
        return []
    return sorted(out.doc_id.tolist())


def test_token_budget_matches_brute_force():
    rng = np.random.default_rng(11)
    rows = [(i, int(rng.integers(0, 12)), int(rng.integers(1, 40)))
            for i in range(200)]
    for budget in (0, 37, 500, 2000, 10**9):
        assert _select(rows, budget) == _brute_budget(rows, budget), budget


def test_token_budget_boundary_tiebreak_by_id():
    # all docs share ONE score: the boundary group is the whole corpus and
    # selection must be an id-ascending prefix
    rows = [(i, 5, 10) for i in range(20)]
    assert _select(rows, 35) == [0, 1, 2]  # 3 docs of 10 fit in 35
    assert _select(rows, 200) == list(range(20))


def test_token_budget_partition_invariance_and_empty():
    rows = [(i, i % 7, 5 + i % 3) for i in range(150)]
    a = _select(rows, 300, parallelism=2)
    b = _select(rows, 300, parallelism=16)
    assert a == b == _brute_budget(rows, 300)
    from dedup_ray.stages.ordering import token_budget_select

    empty = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "score": pa.array([], pa.int64()),
        "n_tokens": pa.array([], pa.int64()),
    }))
    assert token_budget_select(empty, budget=100).count() == 0


# ---------------------------------------------------------------------------
# token_budget_select, grouped


def _brute_grouped(rows, budget):
    """rows = (id, group, score, toks); per-group (score DESC, id) prefix."""
    kept = []
    for g in {r[1] for r in rows}:
        sub = [(r[0], r[2], r[3]) for r in rows if r[1] == g]
        kept += _brute_budget(sub, budget)
    return sorted(kept)


def _select_grouped(rows, budget, parallelism=4):
    from dedup_ray.stages.ordering import token_budget_select

    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "grp": pa.array([r[1] for r in rows], pa.string()),
        "score": pa.array([r[2] for r in rows], pa.int64()),
        "n_tokens": pa.array([r[3] for r in rows], pa.int64()),
    })
    ds = ray.data.from_arrow(t).repartition(parallelism)
    out = token_budget_select(ds, budget=budget, group_col="grp").to_pandas()
    if "doc_id" not in out.columns:
        assert out.empty
        return []
    return sorted(out.doc_id.tolist())


def test_grouped_budget_matches_brute_force():
    rng = np.random.default_rng(7)
    rows = [(i, f"g{int(rng.integers(0, 4))}", int(rng.integers(0, 10)),
             int(rng.integers(1, 30))) for i in range(300)]
    for budget in (0, 50, 400, 10**9):
        got = _select_grouped(rows, budget)
        assert got == _brute_grouped(rows, budget), budget


def test_grouped_budget_mixed_fit_and_crossing():
    # g_small fits whole; g_big crosses and must cut at the boundary class
    rows = ([(i, "g_small", 1, 5) for i in range(3)]          # 15 tokens
            + [(100 + i, "g_big", 2, 40) for i in range(10)])  # 400 tokens
    got = _select_grouped(rows, 100)
    assert got == [0, 1, 2, 100, 101]  # small whole; big: 2 docs of 40

    # partition invariance
    assert _select_grouped(rows, 100, parallelism=16) == got


def test_range_rank_matches_sorted_order():
    from dedup_ray.stages.ordering import range_rank

    rng = np.random.default_rng(3)
    n = 500
    keys = rng.choice([1.5, 2.25, 7.0, 9.5, 11.0], size=n)  # heavy ties
    ids = rng.permutation(n).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array(ids), "k": pa.array(keys),
    })).repartition(5)
    out = range_rank(ds, key_col="k", id_col="id",
                     num_partitions=6).to_pandas()
    order = np.lexsort((ids, keys))
    want = {int(ids[j]): pos for pos, j in enumerate(order)}
    assert dict(zip(out["id"], out["rank"])) == want
    assert sorted(out["rank"]) == list(range(n))


def test_range_rank_partition_invariance_and_tiny_sample():
    from dedup_ray.stages.ordering import range_rank

    ids = np.arange(40, dtype=np.int64)
    keys = (ids % 7).astype(np.float64)
    ds = ray.data.from_arrow(pa.table({"id": pa.array(ids),
                                       "k": pa.array(keys)}))
    # sample_rate so low the sample is empty -> one bucket, still exact
    a = range_rank(ds, "k", "id", sample_rate=1e-9,
                   num_partitions=2).to_pandas().sort_values("id")
    b = range_rank(ds.repartition(8), "k", "id", sample_rate=0.5,
                   num_partitions=5).to_pandas().sort_values("id")
    assert a["rank"].tolist() == b["rank"].tolist()


def test_range_rank_empty():
    from dedup_ray.stages.ordering import range_rank

    ds = ray.data.from_arrow(pa.table({
        "id": pa.array([], pa.int64()), "k": pa.array([], pa.float64()),
    }))
    out = range_rank(ds, "k", "id")
    assert out.count() == 0
    assert out.schema().names == ["id", "k", "rank"]

def test_group_percent_rank_matches_pandas():
    from dedup_ray.stages.ordering import group_percent_rank

    rng = np.random.default_rng(11)
    n = 300
    groups = rng.choice(["en", "de", "fr", "solo"], size=n,
                        p=[0.5, 0.3, 0.19, 0.01]).astype(object)
    vals = rng.integers(0, 50, size=n).astype(np.int64)  # heavy ties
    ids = np.arange(n, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids), "lang": pa.array(groups, pa.string()),
        "v": pa.array(vals),
    })).repartition(7)
    out = group_percent_rank(ds, group_col="lang", value_col="v",
                             id_col="doc_id", num_partitions=4).to_pandas()

    import pandas as pd
    df = pd.DataFrame({"doc_id": ids, "lang": groups, "v": vals})
    # percent_rank over (v, doc_id): ids unique -> rank == row_number
    df = df.sort_values(["lang", "v", "doc_id"]).reset_index(drop=True)
    df["rn"] = df.groupby("lang").cumcount()
    sizes = df.groupby("lang")["v"].transform("size")
    want = df["rn"] / np.maximum(sizes - 1, 1)
    expect = dict(zip(df["doc_id"], want))
    got = dict(zip(out["doc_id"], out["pct_rank"]))
    assert got == expect
    assert len(out) == n


def test_group_percent_rank_singleton_and_empty():
    from dedup_ray.stages.ordering import group_percent_rank

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "lang": pa.array(["xx"], pa.string()),
        "v": pa.array([9.0], pa.float64()),
    }))
    out = group_percent_rank(ds, "lang", "v", "doc_id").to_pandas()
    assert out["pct_rank"].tolist() == [0.0]

    empty = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "lang": pa.array([], pa.string()),
        "v": pa.array([], pa.float64()),
    }))
    out2 = group_percent_rank(empty, "lang", "v", "doc_id")
    assert out2.count() == 0


def test_interleave_by_key_round_robin_property():
    from dedup_ray.stages.ordering import interleave_by_key

    rng = np.random.default_rng(23)
    n = 200
    keys = rng.choice(["a", "b", "c", "d"], size=n,
                      p=[0.4, 0.3, 0.2, 0.1]).astype(object)
    ids = np.arange(n, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids),
        "k": pa.array(keys, pa.string()),
    })).repartition(5)
    out = interleave_by_key(ds, "k", "doc_id",
                            num_partitions=3).to_pandas()
    assert len(out) == n
    # positions are a strict total order
    assert out["pos"].is_unique
    # while every key still has rows, consecutive positions never share
    # a key: check the first 4*min_count positions are a round robin
    counts = out.groupby("k").size()
    full_rounds = counts.min() * 4
    head = out[out.pos < full_rounds].sort_values("pos")
    for i in range(0, len(head) - 1):
        assert head.iloc[i]["k"] != head.iloc[i + 1]["k"]
    # rank spacing: a key's successive positions differ by exactly K
    for k, sub in out.groupby("k"):
        p = np.sort(sub["pos"].to_numpy())
        assert (np.diff(p) == 4).all()
    # partition invariance
    out2 = interleave_by_key(ds.repartition(2), "k", "doc_id",
                             num_partitions=5).to_pandas()
    a = out.sort_values("doc_id")["pos"].tolist()
    b = out2.sort_values("doc_id")["pos"].tolist()
    assert a == b


def test_snm_pairs_matches_brute_force():
    from dedup_ray.stages.ordering import snm_pairs

    rng = np.random.default_rng(41)
    n, w = 120, 5
    keys = rng.choice([1.0, 2.0, 3.0, 7.5], size=n)  # heavy ties
    ids = rng.permutation(n).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array(ids), "k": pa.array(keys),
    })).repartition(6)
    out = snm_pairs(ds, key_col="k", id_col="id", window=w,
                    num_partitions=4).to_pandas()
    got = set(zip(out["id1"], out["id2"]))

    order = np.lexsort((ids, keys))
    sorted_ids = ids[order]
    want = {
        (int(sorted_ids[i]), int(sorted_ids[j]))
        for i in range(n) for j in range(i + 1, min(i + w, n))
    }
    assert got == want
    assert len(out) == len(want)  # no duplicate pair emission

    # partition invariance
    out2 = snm_pairs(ds.repartition(2), key_col="k", id_col="id",
                     window=w, num_partitions=7).to_pandas()
    assert set(zip(out2["id1"], out2["id2"])) == want


def test_zorder_key_locality_and_bounds():
    from dedup_ray.stages.ordering import zorder_key

    # exhaustive 16x16 grid: morton curve properties
    xs, ys = np.meshgrid(np.arange(16), np.arange(16))
    t = pa.table({"x": pa.array(xs.ravel().astype(np.int64)),
                  "y": pa.array(ys.ravel().astype(np.int64))})
    out = zorder_key(ray.data.from_arrow(t), ["x", "y"],
                     bits=4).to_pandas()
    # bijective over the grid
    assert sorted(out["zkey"]) == list(range(256))
    # classic morton spot checks: z(1,0)=1 (x is bit 0), z(0,1)=2,
    # z(3,3)=15, z(15,15)=255
    m = {(r.x, r.y): r.zkey for r in out.itertuples()}
    assert m[(1, 0)] == 1 and m[(0, 1)] == 2
    assert m[(3, 3)] == 15 and m[(15, 15)] == 255
    # out-of-range raises
    bad = ray.data.from_arrow(pa.table({
        "x": pa.array([16], pa.int64()), "y": pa.array([0], pa.int64()),
    }))
    import pytest
    with pytest.raises(Exception):
        zorder_key(bad, ["x", "y"], bits=4).materialize()
