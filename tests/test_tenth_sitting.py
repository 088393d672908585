"""Round-4 regressions: ADVICE.md fixes + oracle-dtype class."""

import numpy as np
import pyarrow as pa
import pytest

import ray


def test_bfs_null_seeds_dropped_both_paths():
    # ADVICE r3 (graph.py:506): a null seed used to factorize to code -1,
    # and dist[cseed]=0 silently seeded the LAST factorized node in the
    # local fast path.  Null seeds must be dropped in BOTH paths.
    from dedup_ray.ops.graph import multi_source_bfs

    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([0, 1, 3], pa.int64()),
        "dst": pa.array([1, 2, 4], pa.int64()),
    }))
    seeds = ray.data.from_arrow(pa.table({
        "node": pa.array([0, None], pa.int64())}))
    loc = multi_source_bfs(edges, seeds, max_hops=3).to_pandas()
    dist = multi_source_bfs(edges, seeds, max_hops=3,
                            local_edge_limit=0).to_pandas()
    got_l = dict(zip(loc["node"], loc["dist"]))
    got_d = dict(zip(dist["node"], dist["dist"]))
    # the null seed contributes nothing: 3/4 stay unreached (before the
    # fix the local path marked node 4 — last factorized — as a seed)
    assert got_l == {0: 0, 1: 1, 2: 2}
    assert got_l == got_d


def test_canopy_block_doc_cap_observable_overflow():
    # ADVICE r3 (linkage.py:281): near-identical docs share their min
    # shingle BY DESIGN, so a template flood lands in ONE block and the
    # dense docs x shingles matrix is unbounded by num_blocks.  The cap
    # must keep the smallest ids and emit overflow as center_id=-2.
    from dedup_ray.ops.linkage import canopy_cluster

    n = 12
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        # identical text -> one shared min shingle -> one block
        "text": pa.array(["alpha beta gamma delta"] * n),
    }))
    df = canopy_cluster(docs, num_blocks=64, num_partitions=2,
                        block_doc_cap=5).to_pandas()
    over = df[df.center_id == -2]
    kept = df[df.center_id >= 0]
    # the 7 largest ids overflow; the 5 smallest run the canopy loop
    assert sorted(over.doc_id) == list(range(5, n))
    assert set(kept.doc_id) == set(range(5))
    # identical docs -> a single canopy centered at min id 0
    assert (kept.center_id == 0).all()
    # uncapped control: everything clusters, no -2 rows
    full = canopy_cluster(docs, num_blocks=64, num_partitions=2).to_pandas()
    assert (full.center_id == 0).all()


def test_exact_quantiles_single_pull_many_intervals():
    # r4: the final collect is ONE tagged pass over ALL unresolved
    # intervals (was one plan launch per quantile).  Force the
    # multi-interval path with a tiny collect_limit and verify exact
    # k-th-smallest semantics against numpy.
    import math

    from dedup_ray.stages.ordering import exact_quantiles

    rng = np.random.default_rng(42)
    vals = rng.permutation(np.arange(2000, dtype=np.float64) * 1.5 - 7.0)
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals, pa.float64())}))
    qs = [0.05, 0.25, 0.5, 0.75, 0.95]
    qt = exact_quantiles(ds, "v", qs, n_bins=4, collect_limit=16,
                         num_partitions=2)
    srt = np.sort(vals)
    got = dict(zip(qt["q"].to_pylist(), qt["value"].to_pylist()))
    for q in qs:
        k = 1 + math.floor(q * (len(vals) - 1))
        assert got[q] == round(float(srt[k - 1]), 6), (q, got[q])


def test_auto_partitions_matches_fixed_and_derives_count():
    # r4: partition count follows data size (num_partitions² shuffle
    # blocks made fixed np=32 pure overhead at bench scale).  Partition
    # count is an execution knob: cluster output must be IDENTICAL.
    import ray.data as rd

    from dedup_ray import DedupConfig
    from dedup_ray.pipelines.dedup import dedup_pipeline
    from dedup_ray.sources.pages import planted_pages

    pages, _ = planted_pages(n_base=30, seed=7)
    fixed = DedupConfig(minhash_concurrency=2, num_partitions=4)
    # r5: auto_partitions defaults True, so a default-constructed config
    # takes the derived path; an explicit num_partitions pins the count
    # and disables derivation (the library caller's override)
    auto = DedupConfig(minhash_concurrency=2, docs_per_partition=10)
    assert auto.auto_partitions and not auto.partitions_pinned
    assert fixed.partitions_pinned and fixed.num_partitions == 4
    assert DedupConfig().num_partitions == 16  # un-pinned normalizes
    # pinnedness survives dataclasses.replace of an UNRELATED field:
    # the copy of an un-pinned config keeps deriving from data
    import dataclasses

    cpy = dataclasses.replace(auto, jaccard_threshold=0.6)
    assert not cpy.partitions_pinned
    repin = dataclasses.replace(auto, num_partitions=32,
                                partitions_pinned=True)
    assert repin.partitions_pinned and repin.num_partitions == 32
    a, _ = dedup_pipeline(rd.from_arrow(pages), fixed)
    b, _ = dedup_pipeline(rd.from_arrow(pages), auto)
    da = a.to_pandas().sort_values("url").reset_index(drop=True)
    db = b.to_pandas().sort_values("url").reset_index(drop=True)
    assert da.equals(db)
    # semantic hash unaffected by the execution knobs
    assert fixed.semantic_hash() == auto.semantic_hash()


def test_group_min_engine_equals_lexsort_reference():
    # r4: the reduceat-based _GroupMinEngine must agree with the
    # lexsort reference _group_min_u128 for every (ties, empty, single)
    # shape — small hi range forces heavy hi-ties so the lo tie-break
    # path is exercised.
    from dedup_ray.stages.minhash import _GroupMinEngine, _group_min_u128

    rng = np.random.default_rng(3)
    for trial in range(200):
        n = int(rng.integers(0, 120))
        groups = rng.integers(0, 15, n)
        hi = rng.integers(0, 4, n).astype(np.uint64)
        lo = rng.integers(0, 1 << 62, n).astype(np.uint64)
        g1, h1, l1 = _group_min_u128(hi, lo, groups)
        g2, h2, l2 = _GroupMinEngine(groups).min128(hi, lo)
        assert np.array_equal(g1, g2)
        assert np.array_equal(h1, h2)
        assert np.array_equal(l1, l2)


def test_pava_equals_minimax_closed_form():
    # r4: isotonic_calibration's engine reduce is PAVA; the oracle
    # replays the minimax closed form.  They are the same function —
    # pin that with the dense reference on random weighted inputs.
    #
    # Known boundary risk (round-5 advice): the two are mathematically
    # equal but their float operation ORDER differs (and DuckDB's avg
    # orders differently again), so a fitted value landing within ~1ulp
    # of a 6-dp rounding boundary (…x.xxxxxx5) COULD round differently
    # and fail an exact value-hash compare.  Our own oracle checker
    # compares floats at atol=1e-9 and is immune; the driver's exact
    # hash is exposed only to that measure-zero boundary case.  Nothing
    # to fix in-engine without giving up the PAVA reduce (15.1→1.1 s);
    # if a driver round ever flags isotonic_nb_docs with a ≤1e-6 value
    # delta, this is the cause.
    rng = np.random.default_rng(7)

    def minimax(w, sy):
        n = len(w)
        cw = np.concatenate([[0.0], np.cumsum(w)])
        cy = np.concatenate([[0.0], np.cumsum(sy)])
        with np.errstate(divide="ignore", invalid="ignore"):
            A = (cy[None, 1:] - cy[:-1, None]) \
                / (cw[None, 1:] - cw[:-1, None])
        M = np.minimum.accumulate(A[:, ::-1], axis=1)[:, ::-1]
        return np.maximum.accumulate(
            np.where(np.tril(np.ones((n, n), bool)).T, M, -np.inf),
            axis=0).diagonal()

    def pava(w, sy):
        n = len(w)
        cw = np.concatenate([[0.0], np.cumsum(w)])
        cy = np.concatenate([[0.0], np.cumsum(sy)])

        def blk(s, e):
            return (cy[e + 1] - cy[s]) / (cw[e + 1] - cw[s])

        starts, avgs = [], []
        for i in range(n):
            starts.append(i)
            avgs.append(blk(i, i))
            while len(starts) > 1 and avgs[-1] <= avgs[-2]:
                starts.pop()
                avgs.pop()
                avgs[-1] = blk(starts[-1], i)
        iso = np.empty(n)
        b = starts + [n]
        for bi in range(len(starts)):
            iso[b[bi]:b[bi + 1]] = avgs[bi]
        return iso

    for trial in range(300):
        n = int(rng.integers(1, 40))
        w = rng.integers(1, 5, n).astype(float)
        sy = rng.random(n) * w
        assert np.array_equal(np.round(minimax(w, sy), 6),
                              np.round(pava(w, sy), 6))


def test_bfs_all_null_seeds_empty_result():
    from dedup_ray.ops.graph import multi_source_bfs

    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([0], pa.int64()),
        "dst": pa.array([1], pa.int64()),
    }))
    seeds = ray.data.from_arrow(pa.table({
        "node": pa.array([None], pa.int64())}))
    assert multi_source_bfs(edges, seeds, max_hops=2).count() == 0
