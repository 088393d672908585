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


def test_bfs_all_null_seeds_empty_result():
    from dedup_ray.ops.graph import multi_source_bfs

    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([0], pa.int64()),
        "dst": pa.array([1], pa.int64()),
    }))
    seeds = ray.data.from_arrow(pa.table({
        "node": pa.array([None], pa.int64())}))
    assert multi_source_bfs(edges, seeds, max_hops=2).count() == 0
