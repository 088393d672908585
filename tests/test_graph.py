"""Per-block graph features vs an independent networkx oracle, and the
vectorized bucket pair emitter (hot-cap + census) vs brute force."""

import numpy as np
import pandas as pd
import pytest
import pyarrow as pa
import ray.data as rd

from dedup_ray.ops.graph import (
    block_graph_features,
    same_component_pairs,
    shortest_path_pairs,
)
from dedup_ray.stages.lsh import _emit_pairs, emit_bucket_pairs


def make_block(seed: int = 7, n: int = 12, p: float = 0.3) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    ids = [f"d{i:02d}" for i in range(n)]
    for a in range(n):
        for b in range(a + 1, n):
            if rng.random() < p:
                rows.append((ids[a], ids[b], float(rng.uniform(0.1, 1.0))))
            elif rng.random() < 0.2:
                rows.append((ids[a], ids[b], 0.0))  # sim 0: node, no edge
    return pd.DataFrame(rows, columns=["id1", "id2", "sim"])


def nx_oracle(df: pd.DataFrame) -> dict:
    import networkx as nx

    g = nx.Graph()
    nodes = set(df["id1"]) | set(df["id2"])
    g.add_nodes_from(nodes)
    for i1, i2, s in zip(df["id1"], df["id2"], df["sim"]):
        if s > 0:
            g.add_edge(i1, i2, weight=1.0 / s)
    return dict(nx.all_pairs_dijkstra_path_length(g))


def test_shortest_path_matches_networkx():
    df = make_block()
    out = shortest_path_pairs(df)
    lengths = nx_oracle(df)
    for i1, i2, sp in zip(out["id1"], out["id2"], out["sp"]):
        d = lengths.get(i1, {}).get(i2)
        expect = 1.0 / d if d and d > 0 else 0.0
        assert abs(sp - expect) < 1e-9, (i1, i2, sp, expect)


def test_same_component_matches_networkx():
    import networkx as nx

    df = make_block(seed=11)
    out = same_component_pairs(df)
    g = nx.Graph()
    g.add_nodes_from(set(df["id1"]) | set(df["id2"]))
    for i1, i2, s in zip(df["id1"], df["id2"], df["sim"]):
        if s > 0:
            g.add_edge(i1, i2)
    comp = {n: i for i, c in enumerate(nx.connected_components(g)) for n in c}
    for i1, i2, f in zip(out["id1"], out["id2"], out["same_comp"]):
        assert f == (1.0 if comp[i1] == comp[i2] else 0.0)


def test_block_graph_features_distributed(ray_session):
    df = make_block(seed=3)
    df["block"] = "b0"
    df2 = make_block(seed=4)
    df2["block"] = "b1"
    both = pd.concat([df, df2], ignore_index=True)
    out = (
        block_graph_features(rd.from_pandas(both), "block")
        .to_pandas()
        .sort_values(["block", "id1", "id2"])
        .reset_index(drop=True)
    )
    for blk, sub in both.groupby("block"):
        local = shortest_path_pairs(sub)
        got = out[out["block"] == blk].reset_index(drop=True)
        assert len(got) == len(local)
        assert np.allclose(
            got.sort_values(["id1", "id2"])["sp"].to_numpy(),
            local.sort_values(["id1", "id2"])["sp"].to_numpy(),
        )


# ---------------------------------------------------------------------------
# emit_bucket_pairs: vectorized vs brute force, hot cap, census
# ---------------------------------------------------------------------------

def brute_pairs(part: pd.DataFrame, key_cols, id_col, cap, window, max_df=None):
    pairs, hot = set(), []
    for key, sub in part.groupby(key_cols, sort=False):
        ids = sorted(sub[id_col].drop_duplicates())
        if max_df is not None and len(ids) > max_df:
            hot.append(key if len(key_cols) > 1 else key)
            continue
        if len(ids) < 2:
            continue
        a, b, _ = _emit_pairs(np.array(ids, dtype=object), cap, window)
        pairs.update(zip(a.tolist(), b.tolist()))
    return pairs, hot


def test_emit_bucket_pairs_matches_brute():
    rng = np.random.default_rng(5)
    part = pd.DataFrame(
        {
            "band": rng.integers(0, 3, size=400),
            "bhash": rng.integers(0, 12, size=400),
            "id": [f"u{int(x):03d}" for x in rng.integers(0, 120, size=400)],
        }
    )
    got, hot = emit_bucket_pairs(part, ["band", "bhash"], "id", cap=256, window=2)
    expect, _ = brute_pairs(part, ["band", "bhash"], "id", 256, 2)
    assert set(zip(got["id1"], got["id2"])) == expect
    assert all(len(h) == 0 for h in hot)


def test_hot_bucket_capped_but_connected():
    """A bucket over the cap emits O(n) edges that still connect all ids."""
    n = 60
    part = pd.DataFrame(
        {"k": [1] * n, "id": [f"u{i:02d}" for i in range(n)]}
    )
    got, _ = emit_bucket_pairs(part, ["k"], "id", cap=10, window=2)
    assert got["capped"].all()
    assert len(got) < n * (n - 1) // 2  # far fewer than all pairs
    # star to min keeps every id reachable
    import networkx as nx

    g = nx.Graph(zip(got["id1"], got["id2"]))
    assert nx.number_connected_components(g) == 1
    assert g.number_of_nodes() == n


def test_census_drops_hot_keys():
    part = pd.DataFrame(
        {
            "chash": [1] * 20 + [2] * 3 + [3] * 2,
            "id": [f"a{i}" for i in range(20)] + ["x", "y", "z", "p", "q"],
        }
    )
    pairs, (hot,) = emit_bucket_pairs(
        part, ["chash"], "id", cap=256, window=2, max_df=8
    )
    assert list(hot) == [1]
    keys = set(zip(pairs["id1"], pairs["id2"]))
    assert ("x", "y") in keys and ("p", "q") in keys
    assert not any(a.startswith("a") for a, _ in keys)


def test_triangle_count_bruteforce():
    import itertools

    import numpy as np
    import pyarrow as pa
    import ray.data

    from dedup_ray.ops.graph import triangle_count

    rng = np.random.default_rng(11)
    n = 40
    pairs = [(i, j) for i in range(n) for j in range(i + 1, n)
             if rng.random() < 0.12]
    adj = set(pairs)
    want = sum(1 for a, b, c in itertools.combinations(range(n), 3)
               if (a, b) in adj and (b, c) in adj and (a, c) in adj)
    # feed edges in random orientation to exercise the orient pass
    ar = [(b, a) if rng.random() < 0.5 else (a, b) for a, b in pairs]
    ds = rd.from_arrow(pa.table({
        "a": pa.array([x for x, _ in ar], pa.int64()),
        "b": pa.array([y for _, y in ar], pa.int64()),
    })).repartition(3)
    out = triangle_count(ds, num_partitions=4)
    assert out["n_triangles"][0].as_py() == want
    assert want > 0  # the fixture actually contains triangles


def test_k_core_matches_reference_peeling(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from dedup_ray.ops.graph import k_core

    rng = np.random.default_rng(19)
    # clique (survives 2-core) + tree tendrils (peel away) + random chaff
    clique = [(100 + i, 100 + j) for i in range(5) for j in range(i + 1, 5)]
    tree = [(i, i // 2) for i in range(1, 40)]
    chaff = [(int(a), int(b)) for a, b in
             rng.integers(200, 240, (30, 2)) if a != b]
    edges = pd.DataFrame(clique + tree + chaff, columns=["a", "b"]) \
        .drop_duplicates()

    def ref_peel(df, k):
        e = {tuple(r) for r in df.itertuples(index=False)}
        while True:
            deg = {}
            for a, b in e:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            weak = {n for n, d in deg.items() if d < k}
            kept = {p for p in e if p[0] not in weak and p[1] not in weak}
            if kept == e:
                return e
            e = kept

    expected = sorted(ref_peel(edges, 2))
    got = sorted(
        tuple(r) for r in k_core(
            rd.from_pandas(edges, override_num_blocks=3), k=2,
            max_rounds=30, num_partitions=4,
        ).to_pandas().itertuples(index=False)
    )
    assert got == expected
    assert any(a >= 100 and a < 200 for a, _ in got)  # clique survived
    assert not any(a < 40 and b < 40 for a, b in got)  # tree peeled


def test_resolve_pointers_long_chain_and_branches():
    from dedup_ray.ops.graph import resolve_pointers

    # one chain 0<-1<-...<-30 (length 30 needs >=5 doublings) plus a
    # star: 100..105 -> 0
    src = list(range(1, 31)) + [100, 101, 102, 103, 104, 105]
    dst = list(range(0, 30)) + [0] * 6
    edges = rd.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64()),
    })).repartition(4)
    out = resolve_pointers(edges, rounds=5, num_partitions=3).to_pandas()
    assert len(out) == len(src)
    assert (out["final"] == 0).all()


def test_resolve_pointers_string_ids_and_cycle():
    from dedup_ray.ops.graph import resolve_pointers

    # a -> b -> c (terminal), plus cycle x -> y -> x (never resolves,
    # pointer stays in-cycle)
    edges = rd.from_arrow(pa.table({
        "src": pa.array(["a", "b", "x", "y"]),
        "dst": pa.array(["b", "c", "y", "x"]),
    }))
    out = resolve_pointers(edges, rounds=4, num_partitions=2).to_pandas()
    m = dict(zip(out["src"], out["final"]))
    assert m["a"] == "c" and m["b"] == "c"
    assert m["x"] in ("x", "y") and m["y"] in ("x", "y")


def test_resolve_pointers_partition_invariance():
    from dedup_ray.ops.graph import resolve_pointers

    rng = np.random.default_rng(7)
    # random forest of chains: each node points to a strictly smaller id
    src = np.arange(1, 200, dtype=np.int64)
    dst = np.array([rng.integers(0, s) for s in src], dtype=np.int64)
    tbl = pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    def brute(s):
        nxt = dict(zip(src.tolist(), dst.tolist()))
        while s in nxt:
            s = nxt[s]
        return s

    for parts, nparts in [(2, 3), (8, 5)]:
        out = resolve_pointers(
            rd.from_arrow(tbl).repartition(parts),
            rounds=8, num_partitions=nparts,
        ).to_pandas()
        got = dict(zip(out["src"], out["final"]))
        assert got == {int(s): brute(int(s)) for s in src}


def test_multi_source_bfs_matches_brute_force():
    from collections import deque

    from dedup_ray.ops.graph import multi_source_bfs

    rng = np.random.default_rng(21)
    n = 120
    src = rng.integers(0, n, size=300).astype(np.int64)
    dst = rng.integers(0, n, size=300).astype(np.int64)
    seeds = np.array([0, 50, 99], dtype=np.int64)
    edges = rd.from_arrow(pa.table({
        "src": pa.array(src), "dst": pa.array(dst)})).repartition(4)
    seeds_ds = rd.from_arrow(pa.table({"node": pa.array(seeds)}))

    out = multi_source_bfs(edges, seeds_ds, max_hops=3,
                           num_partitions=3).to_pandas()
    got = dict(zip(out["node"], out["dist"]))

    adj = {}
    for s, d in zip(src, dst):
        adj.setdefault(int(s), []).append(int(d))
    want, q = {int(s): 0 for s in seeds}, deque(int(s) for s in seeds)
    while q:
        u = q.popleft()
        if want[u] >= 3:
            continue
        for v in adj.get(u, []):
            if v not in want:
                want[v] = want[u] + 1
                q.append(v)
    assert got == want


def test_multi_source_bfs_early_stop_and_isolated_seed():
    from dedup_ray.ops.graph import multi_source_bfs

    # chain 0->1->2 plus an isolated seed 9; max_hops far beyond diameter
    edges = rd.from_arrow(pa.table({
        "src": pa.array([0, 1], pa.int64()),
        "dst": pa.array([1, 2], pa.int64()),
    }))
    seeds = rd.from_arrow(pa.table({"node": pa.array([0, 9], pa.int64())}))
    out = multi_source_bfs(edges, seeds, max_hops=8).to_pandas()
    got = dict(zip(out["node"], out["dist"]))
    assert got == {0: 0, 9: 0, 1: 1, 2: 2}


def test_bipartite_project_counts_and_cap():
    from dedup_ray.ops.graph import bipartite_project

    # docs 0,1 both link hosts {10, 11}; doc 2 links {10, 11, 12};
    # duplicate edge rows must not inflate counts
    edges = rd.from_arrow(pa.table({
        "src": pa.array([0, 0, 1, 1, 2, 2, 2, 2], pa.int64()),
        "dst": pa.array([10, 11, 10, 11, 10, 11, 12, 12], pa.int64()),
    })).repartition(3)
    out = bipartite_project(edges, num_partitions=2).to_pandas()
    got = {(r.dst1, r.dst2): r.n_common for r in out.itertuples()}
    assert got == {(10, 11): 3, (10, 12): 1, (11, 12): 1}

    # degree cap: a hub src with 5 dsts capped to its 2 smallest
    hub = rd.from_arrow(pa.table({
        "src": pa.array([7] * 5, pa.int64()),
        "dst": pa.array([50, 30, 40, 10, 20], pa.int64()),
    }))
    capped = bipartite_project(hub, max_degree=2,
                               num_partitions=2).to_pandas()
    assert {(r.dst1, r.dst2) for r in capped.itertuples()} == {(10, 20)}


def test_label_propagation_bridge_and_determinism():
    from dedup_ray.ops.graph import label_propagation

    # two triangles joined by ONE bridge edge: LPA keeps two
    # communities (labeled by each triangle's min id); CC would merge.
    e = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12), (2, 10)]
    t = pa.table({"a": pa.array([x for x, _ in e], pa.int64()),
                  "b": pa.array([y for _, y in e], pa.int64())})
    out = (label_propagation(rd.from_arrow(t), rounds=4, num_partitions=3)
           .to_pandas().sort_values("node"))
    lab = dict(zip(out["node"], out["label"]))
    assert lab == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 12: 10}

    # partition-count invariance (determinism does not depend on layout)
    out2 = (label_propagation(rd.from_arrow(t), rounds=4, num_partitions=1)
            .to_pandas().sort_values("node"))
    assert dict(zip(out2["node"], out2["label"])) == lab


def test_label_propagation_brute_force_replay():
    from dedup_ray.ops.graph import label_propagation

    rng = np.random.default_rng(5)
    a = rng.integers(0, 30, 60).astype(np.int64)
    b = rng.integers(0, 30, 60).astype(np.int64)
    t = pa.table({"a": pa.array(a), "b": pa.array(b)})
    out = (label_propagation(rd.from_arrow(t), rounds=3, num_partitions=4)
           .to_pandas())
    got = dict(zip(out["node"], out["label"]))

    # reference replay: symmetrized multiset, self-vote, min-label ties
    from collections import Counter, defaultdict
    nbrs = defaultdict(list)
    for x, y in zip(a, b):
        nbrs[x].append(y)
        nbrs[y].append(x)
    lab = {n: n for n in nbrs}
    for _ in range(3):
        new = {}
        for n in nbrs:
            c = Counter(lab[m] for m in nbrs[n])
            c[lab[n]] += 1
            best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        lab = new
    assert got == lab


def test_reciprocal_edges_small_graph():
    import ray.data

    from dedup_ray.ops.graph import reciprocal_edges

    e = pa.table({
        "src": ["h1", "h2", "h1", "h3", "h2", "h4", "h4", "h2"],
        "dst": ["h2", "h1", "h3", "h1", "h3", "h4", "h5", "h1"],
    })
    r = (reciprocal_edges(ray.data.from_arrow(e), num_partitions=4)
         .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    # h1<->h2 mutual (1 fwd, 2 back); h1<->h3 mutual; h2->h3 one-way out;
    # self loop h4->h4 and dangling h4->h5 excluded.
    assert list(zip(r.a, r.b, r.w_ab, r.w_ba)) == [
        ("h1", "h2", 1.0, 2.0), ("h1", "h3", 1.0, 1.0)]


def test_reciprocal_edges_weighted_and_int_keys():
    import ray.data

    from dedup_ray.ops.graph import reciprocal_edges

    e = pa.table({
        "src": pa.array([1, 2, 1, 3], pa.int64()),
        "dst": pa.array([2, 1, 3, 1], pa.int64()),
        "n": pa.array([5, 7, 1, 2], pa.int64()),
    })
    r = (reciprocal_edges(ray.data.from_arrow(e), weight_col="n",
                          num_partitions=2)
         .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    assert list(zip(r.a, r.b, r.w_ab, r.w_ba)) == [
        (1, 2, 5.0, 7.0), (1, 3, 1.0, 2.0)]


def test_diameter_double_sweep_path_graph():
    import ray.data as rd

    from dedup_ray.ops.graph import diameter_double_sweep

    # path 3-0-1-2-5-4: symmetrized edges; true diameter = 5.
    # Start = min node (0); sweep 1 peaks at an endpoint; sweep 2 from
    # the endpoint measures the full path length.
    src = [3, 0, 1, 2, 5]
    dst = [0, 1, 2, 5, 4]
    edges = rd.from_arrow(pa.table({
        "src": pa.array(src + dst, pa.int64()),
        "dst": pa.array(dst + src, pa.int64()),
    })).repartition(3)
    out = diameter_double_sweep(edges, num_partitions=3).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["start_node"] == 0
    # from 0: dist(3)=1, dist(4)=3 -> peak = 4; ecc(4) = 5 (to 3)
    assert r["peak_node"] == 4
    assert r["diameter_lb"] == 5


def test_diameter_double_sweep_tie_and_star():
    import ray.data as rd

    from dedup_ray.ops.graph import diameter_double_sweep

    # star centered at 10 with leaves 1,2,3: all leaves at dist 1 from
    # each sweep start; peak tie broken to the smallest node id.
    leaves = [1, 2, 3]
    edges = rd.from_arrow(pa.table({
        "src": pa.array([10] * 3 + leaves, pa.int64()),
        "dst": pa.array(leaves + [10] * 3, pa.int64()),
    }))
    out = diameter_double_sweep(edges, num_partitions=2).to_pandas()
    r = out.iloc[0]
    assert r["start_node"] == 1      # min node id
    assert r["peak_node"] == 2       # dist 2 via center; min of {2, 3}
    assert r["diameter_lb"] == 2


def test_link_predict_triangle_plus_tail():
    import math

    from dedup_ray.ops.graph import link_predict

    # triangle 1-2-3 plus tail 3-4 (duplicate + reversed rows must not
    # inflate counts): only (1,4) and (2,4) are absent pairs with a
    # common neighbor (3, degree 3)
    edges = rd.from_arrow(pa.table({
        "a": pa.array([1, 2, 1, 3, 3, 4], pa.int64()),
        "b": pa.array([2, 3, 3, 1, 4, 3], pa.int64()),
    })).repartition(3)
    out = link_predict(edges, num_partitions=2).to_pandas()
    got = {(r.u, r.v): (r.cn, r.aa) for r in out.itertuples()}
    w3 = round(1.0 / math.log(3.0), 6)
    assert got == {(1, 4): (1, w3), (2, 4): (1, w3)}


def test_link_predict_degree_cap_and_partition_invariance():
    from dedup_ray.ops.graph import link_predict

    # star center 0 with leaves 1..6: every leaf pair scores cn=1,
    # aa=1/ln(6); capping the hub to 3 neighbors keeps only the pairs
    # among its 3 smallest leaves, with the TRUE degree in the weight
    import math

    edges = rd.from_arrow(pa.table({
        "a": pa.array([0] * 6, pa.int64()),
        "b": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
    }))
    full = link_predict(edges, num_partitions=3).to_pandas()
    assert len(full) == 15
    assert set(full["cn"]) == {1}
    assert set(full["aa"]) == {round(1.0 / math.log(6.0), 6)}

    capped = link_predict(edges, max_degree=3,
                          num_partitions=2).to_pandas()
    assert {(r.u, r.v) for r in capped.itertuples()} == \
        {(1, 2), (1, 3), (2, 3)}
    assert set(capped["aa"]) == {round(1.0 / math.log(6.0), 6)}

    # partitioning must not change results
    p1 = link_predict(edges.repartition(4), num_partitions=1).to_pandas()
    assert len(p1) == 15


def test_k_truss_matches_brute_force():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from dedup_ray.ops.graph import k_truss

    rng = np.random.default_rng(17)
    a = rng.integers(0, 30, 150)
    b = rng.integers(0, 30, 150)
    df = pd.DataFrame({"a": a, "b": b})
    out = k_truss(rd.from_pandas(df), k=4, max_rounds=30,
                  num_partitions=4).to_pandas()
    got = set(zip(out["a"], out["b"]))

    # brute force: peel support < k-2 until fixpoint
    E = {(min(x, y), max(x, y)) for x, y in zip(a, b) if x != y}
    while True:
        nbrs = {}
        for x, y in E:
            nbrs.setdefault(x, set()).add(y)
            nbrs.setdefault(y, set()).add(x)
        weak = {e for e in E
                if len(nbrs[e[0]] & nbrs[e[1]]) < 2}
        if not weak:
            break
        E -= weak
    assert got == E


def test_k_truss_strip_peels_clique_survives():
    import pandas as pd
    import ray.data as rd

    from dedup_ray.ops.graph import k_truss

    strip = [(i, i + 1) for i in range(20)] + [(i, i + 2) for i in range(19)]
    clique = [(100 + i, 100 + j) for i in range(5) for j in range(i + 1, 5)]
    df = pd.DataFrame(strip + clique, columns=["a", "b"])
    out = k_truss(rd.from_pandas(df), k=4, max_rounds=4,
                  num_partitions=2).to_pandas()
    got = set(zip(out["a"], out["b"]))
    assert got == set(clique)


def test_modularity_two_cliques_with_bridge():
    import pandas as pd
    import ray.data as rd

    from dedup_ray.ops.graph import modularity

    # two triangles joined by one bridge; perfect 2-community labeling
    edges = pd.DataFrame(
        [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)],
        columns=["a", "b"])
    labels = pd.DataFrame({"node": [0, 1, 2, 3, 4, 5],
                           "label": [0, 0, 0, 1, 1, 1]})
    out = modularity(rd.from_pandas(edges), rd.from_pandas(labels),
                     num_partitions=2).to_pandas()
    # m=7; e_c=3 each; d_c = 7 each -> Q = 2*(3/7 - (7/14)^2) = 5/14
    assert out["q"].iloc[0] == pytest.approx(round(5 / 14, 6))
    assert out["m"].iloc[0] == 7
    assert out["n_communities"].iloc[0] == 2


def test_assortativity_star_is_minus_one():
    import pandas as pd
    import ray.data as rd

    from dedup_ray.ops.graph import degree_assortativity

    star = pd.DataFrame({"a": [0] * 6, "b": range(1, 7)})
    out = degree_assortativity(rd.from_pandas(star),
                               num_partitions=2).to_pandas()
    assert out["assortativity"].iloc[0] == pytest.approx(-1.0)


def test_scc_local_matches_forced_distributed():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from dedup_ray.ops.graph import strongly_connected_components

    rng = np.random.default_rng(23)
    edges = [(f"n{a}", f"n{b}")
             for a, b in zip(rng.integers(0, 25, 120),
                             rng.integers(0, 25, 120))]
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges], pa.string()),
        "dst": pa.array([e[1] for e in edges], pa.string())}))
    local = sorted((r["node"], r["scc_id"]) for r in
                   strongly_connected_components(ds).take_all())
    dist = sorted((r["node"], r["scc_id"]) for r in
                  strongly_connected_components(
                      ds, local_edge_limit=0).take_all())
    assert local == dist


def test_k_core_local_matches_forced_distributed():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from dedup_ray.ops.graph import k_core

    rng = np.random.default_rng(29)
    df = pd.DataFrame({"a": rng.integers(0, 40, 200),
                       "b": rng.integers(0, 40, 200)})
    for max_rounds in (2, 8):  # both the bounded and the converged case
        loc = k_core(rd.from_pandas(df), k=3,
                     max_rounds=max_rounds).to_pandas()
        dist = k_core(rd.from_pandas(df), k=3, max_rounds=max_rounds,
                      local_edge_limit=0, num_partitions=4).to_pandas()
        key = lambda d: sorted(map(tuple, d[["a", "b"]].values.tolist()))
        assert key(loc) == key(dist)
