"""Property-based invariants (hypothesis) for the core primitives.

These pin the algebraic contracts the catalog oracles can only sample:
CC labels against a union-find reference on arbitrary graphs, exact
quantiles against numpy selection on arbitrary multisets, and the
128-bit group-min engines against each other under adversarial ties.
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

import ray


class _UF:
    def __init__(self):
        self.p = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


edges_strategy = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)),
    min_size=1, max_size=60,
)


@settings(max_examples=25, deadline=None)
@given(edges_strategy)
def test_cc_local_matches_union_find(pairs):
    from dedup_ray.stages.cc import connected_components_local_table

    edges = pa.table({
        "id1": pa.array([a for a, _ in pairs], pa.int64()),
        "id2": pa.array([b for _, b in pairs], pa.int64()),
    })
    got = connected_components_local_table(ray.data.from_arrow(edges))
    uf = _UF()
    for a, b in pairs:
        uf.union(a, b)
    # min-id representative per component, only edge-endpoint nodes
    nodes = {x for p in pairs for x in p}
    reps = {}
    for n in nodes:
        r = uf.find(n)
        reps.setdefault(r, []).append(n)
    want = {}
    for members in reps.values():
        m = min(members)
        for n in members:
            want[n] = m
    got_map = dict(zip(got["id"].to_pylist(),
                       got["cluster_id"].to_pylist()))
    assert got_map == want


@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.integers(-1000, 1000), min_size=1, max_size=300),
    st.lists(st.floats(0.0, 1.0, allow_nan=False), min_size=1,
             max_size=5),
)
def test_exact_quantiles_matches_numpy_selection(vals, qs):
    import math

    from dedup_ray.stages.ordering import exact_quantiles

    arr = np.array(vals, np.float64)
    ds = ray.data.from_arrow(pa.table({"v": pa.array(arr, pa.float64())}))
    qt = exact_quantiles(ds, "v", qs, n_bins=4, collect_limit=8,
                         num_partitions=2)
    srt = np.sort(arr)
    got = dict(zip(qt["q"].to_pylist(), qt["value"].to_pylist()))
    for q in qs:
        k = 1 + math.floor(q * (len(arr) - 1))
        assert got[q] == round(float(srt[k - 1]), 6)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(0, 8), max_size=60),
    st.one_of(st.none(), st.integers(2, 5)),
)
def test_triangle_pairs_grouped_matches_bruteforce(groups, cap):
    from dedup_ray.stages.lsh import triangle_pairs_grouped

    key = np.sort(np.array(groups, np.int64))
    i1, i2 = triangle_pairs_grouped(key, cap=cap)
    got = sorted(zip(i1.tolist(), i2.tolist()))
    want = []
    n = len(key)
    starts = [i for i in range(n) if i == 0 or key[i] != key[i - 1]]
    ends = starts[1:] + [n]
    for st_, en in zip(starts, ends):
        lim = en - st_ if cap is None else min(en - st_, cap)
        for a in range(lim):
            for b in range(a + 1, lim):
                want.append((st_ + a, st_ + b))
    assert got == sorted(want)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 6), st.integers(0, 3),
                       st.integers(0, 10)), max_size=120),
)
def test_group_min_engine_property(rows):
    from dedup_ray.stages.minhash import _GroupMinEngine, _group_min_u128

    groups = np.array([g for g, _, _ in rows], np.int64)
    hi = np.array([h for _, h, _ in rows], np.uint64)
    lo = np.array([l for _, _, l in rows], np.uint64)
    g1, h1, l1 = _group_min_u128(hi, lo, groups)
    g2, h2, l2 = _GroupMinEngine(groups).min128(hi, lo)
    assert np.array_equal(g1, g2)
    assert np.array_equal(h1, h2)
    assert np.array_equal(l1, l2)
