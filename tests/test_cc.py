"""Connected components: local union-find ≡ distributed Star ≡ brute force."""

import numpy as np
import pandas as pd
import ray.data as rd

from dedup_ray.stages.cc import (
    assign_clusters,
    connected_components_distributed,
    connected_components_local,
)


def brute_cc(edges: list[tuple]) -> dict:
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    label = {}
    for start in adj:
        if start in label:
            continue
        comp, stack = [], [start]
        seen = {start}
        while stack:
            x = stack.pop()
            comp.append(x)
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        m = min(comp)
        for x in comp:
            label[x] = m
    return label


def random_edges(n_nodes=60, n_edges=80, seed=5):
    rng = np.random.default_rng(seed)
    e = rng.integers(0, n_nodes, size=(n_edges, 2))
    return [(f"n{a:03d}", f"n{b:03d}") for a, b in e if a != b]


def test_local_matches_brute():
    edges = random_edges()
    ds = rd.from_pandas(
        pd.DataFrame({"id1": [a for a, _ in edges], "id2": [b for _, b in edges]})
    )
    got = connected_components_local(ds).set_index("id")["cluster_id"].to_dict()
    assert got == brute_cc(edges)


def test_distributed_matches_brute():
    edges = random_edges(n_nodes=40, n_edges=50, seed=9)
    ds = rd.from_pandas(
        pd.DataFrame({"id1": [a for a, _ in edges], "id2": [b for _, b in edges]})
    )
    out = connected_components_distributed(ds).to_pandas()
    got = out.set_index("id")["cluster_id"].to_dict()
    assert got == brute_cc(edges)


def test_distributed_chain_and_int_ids():
    """Long chains are the slow-convergence worst case for star contraction;
    integer ids exercise the numeric dtype path of the vectorized rounds."""
    edges = [(i, i + 1) for i in range(0, 200) if i % 50 != 49]  # 4 chains of 50
    edges += [(1000 + a, 1000 + b) for a, b in
              np.random.default_rng(3).integers(0, 80, size=(120, 2)) if a != b]
    ds = rd.from_pandas(
        pd.DataFrame(
            {"id1": [a for a, _ in edges], "id2": [b for _, b in edges]}
        )
    )
    out = connected_components_distributed(ds).to_pandas()
    got = out.set_index("id")["cluster_id"].to_dict()
    assert got == brute_cc(edges)


def test_assign_clusters_singletons():
    docs = rd.from_items([{"url": f"d{i}"} for i in range(6)])
    edges = rd.from_items([{"id1": "d0", "id2": "d3"}, {"id1": "d3", "id2": "d5"}])
    out = assign_clusters(docs, edges, id_col="url").to_pandas()
    got = out.set_index("url")["cluster_id"].to_dict()
    assert got == {
        "d0": "d0",
        "d3": "d0",
        "d5": "d0",
        "d1": "d1",
        "d2": "d2",
        "d4": "d4",
    }
