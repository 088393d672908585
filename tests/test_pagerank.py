"""Distributed PageRank vs a dense NumPy reference (ops/pagerank.py)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from dedup_ray.ops.pagerank import pagerank, pagerank_reference


def _run(n, edges, num_partitions=4, **kw):
    nodes = ray.data.from_arrow(
        pa.table({"node": pa.array(range(n), pa.int64())})
    )
    e = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([s for s, _ in edges], pa.int64()),
                "dst": pa.array([d for _, d in edges], pa.int64()),
            }
        )
    )
    out = (
        pagerank(nodes, e, num_partitions=num_partitions, round_to=None, **kw)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    return out


def test_matches_dense_reference(ray_session):
    n = 40
    edges = [(u, (u * 7 + 3) % n) for u in range(n)] + [
        (u, (u * 13 + 5) % n) for u in range(n)
    ]
    got = _run(n, edges)
    want = pagerank_reference(n, edges)
    assert np.allclose(got["pagerank"].to_numpy(), want, atol=1e-12)
    assert got["pagerank"].sum() == pytest.approx(1.0, abs=1e-9)


def test_dangling_nodes_redistribute(ray_session):
    # node 3 and 4 have no out-edges; their mass spreads uniformly
    n = 5
    edges = [(0, 1), (1, 2), (2, 3), (2, 4), (0, 3)]
    got = _run(n, edges)
    want = pagerank_reference(n, edges)
    assert np.allclose(got["pagerank"].to_numpy(), want, atol=1e-12)
    assert got["pagerank"].sum() == pytest.approx(1.0, abs=1e-9)


def test_multi_edge_counts_per_occurrence(ray_session):
    n = 3
    edges = [(0, 1), (0, 1), (0, 2), (1, 0), (2, 0)]
    got = _run(n, edges)
    want = pagerank_reference(n, edges)
    assert np.allclose(got["pagerank"].to_numpy(), want, atol=1e-12)
    # node 1 receives 2/3 of node 0's emitted mass, node 2 only 1/3
    assert got["pagerank"][1] > got["pagerank"][2]


def test_partition_count_invariance(ray_session):
    n = 30
    edges = [(u, (u * 5 + 1) % n) for u in range(n)] + [
        (u, (u * 11 + 2) % n) for u in range(n) if u % 3
    ]
    a = _run(n, edges, num_partitions=2)
    b = _run(n, edges, num_partitions=8)
    assert np.allclose(
        a["pagerank"].to_numpy(), b["pagerank"].to_numpy(), atol=1e-12
    )


def test_personalized_pagerank_matches_dense_reference(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from dedup_ray.ops.pagerank import pagerank, ppr_reference

    rng = np.random.default_rng(13)
    n = 60
    edges = [(int(a), int(b)) for a, b in rng.integers(0, n, (150, 2))]
    # a few dangling nodes (no out-edges) exercise the seed-restart of
    # dangling mass
    edges = [(a, b) for a, b in edges if a < 55]
    seeds = [3, 17, 42]
    exp = ppr_reference(n, edges, seeds, damping=0.85, iters=6)
    got = pagerank(
        rd.from_pandas(pd.DataFrame({"node": range(n)})),
        rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"])),
        damping=0.85, iters=6, num_partitions=4, round_to=None,
        seed_nodes=seeds,
    ).to_pandas().set_index("node")["pagerank"]
    for v in range(n):
        assert abs(got[v] - exp[v]) < 1e-12, v
    # mass concentrates near seeds: every seed outranks the global median
    med = float(np.median(got.to_numpy()))
    assert all(got[s] > med for s in seeds)


def _hits_reference(edges, iters):
    import numpy as np

    nodes = sorted({n for e in edges for n in e})
    ix = {n: i for i, n in enumerate(nodes)}
    h = np.ones(len(nodes))
    a = np.ones(len(nodes))
    for _ in range(iters):
        a_new = np.zeros(len(nodes))
        for s, d in edges:
            a_new[ix[d]] += h[ix[s]]
        a = a_new / (np.linalg.norm(a_new) or 1.0)
        h_new = np.zeros(len(nodes))
        for s, d in edges:
            h_new[ix[s]] += a[ix[d]]
        h = h_new / (np.linalg.norm(h_new) or 1.0)
    return nodes, h, a


def test_hits_matches_dense_reference():
    import numpy as np
    import pyarrow as pa

    from dedup_ray.ops.pagerank import hits

    rng = np.random.default_rng(37)
    edges = [(int(rng.integers(0, 30)), int(rng.integers(0, 30)))
             for _ in range(80)]
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges], pa.int64()),
        "dst": pa.array([e[1] for e in edges], pa.int64()),
    })).repartition(4)
    out = hits(ds, iters=3, num_partitions=3).to_pandas()
    nodes, h, a = _hits_reference(edges, 3)
    got_h = dict(zip(out["node"], out["hub"]))
    got_a = dict(zip(out["node"], out["authority"]))
    assert set(out["node"]) == set(nodes)
    for n, hv, av in zip(nodes, h, a):
        assert abs(got_h[n] - hv) < 1e-8, (n, got_h[n], hv)
        assert abs(got_a[n] - av) < 1e-8


def test_hits_hub_authority_separation():
    import pyarrow as pa

    from dedup_ray.ops.pagerank import hits

    # star: node 0 links to 1..5 (pure hub); 1..5 have no out-links
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array([0] * 5, pa.int64()),
        "dst": pa.array([1, 2, 3, 4, 5], pa.int64()),
    }))
    out = hits(ds, iters=2).to_pandas().set_index("node")
    assert out.loc[0, "hub"] > 0.99 and out.loc[0, "authority"] == 0
    for n in range(1, 6):
        assert out.loc[n, "hub"] == 0
        assert abs(out.loc[n, "authority"] - 1 / np.sqrt(5)) < 1e-9
