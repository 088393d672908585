"""stages/dbscan.py: grid DBSCAN over the JL projection."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from dedup_ray.stages.dbscan import _sign_matrix, dbscan_grid


def _brute_force_dbscan(Y: np.ndarray, eps: float, min_pts: int,
                        ids: np.ndarray) -> dict:
    d2 = ((Y[:, None, :] - Y[None, :, :]) ** 2).sum(axis=2)
    nbr = d2 <= eps * eps  # includes self
    core = nbr.sum(axis=1) >= min_pts
    # CC over core-core eps-edges, label = min member id
    lab = {int(ids[i]): int(ids[i]) for i in range(len(ids)) if core[i]}
    changed = True
    while changed:
        changed = False
        for i in range(len(ids)):
            if not core[i]:
                continue
            for j in range(len(ids)):
                if core[j] and nbr[i, j]:
                    m = min(lab[int(ids[i])], lab[int(ids[j])])
                    if lab[int(ids[i])] != m or lab[int(ids[j])] != m:
                        lab[int(ids[i])] = m
                        lab[int(ids[j])] = m
                        changed = True
    out = {}
    for i in range(len(ids)):
        if core[i]:
            out[int(ids[i])] = lab[int(ids[i])]
        else:
            cands = [lab[int(ids[j])] for j in range(len(ids))
                     if core[j] and nbr[i, j]]
            out[int(ids[i])] = min(cands) if cands else -1
    return out


def _project(X: np.ndarray) -> np.ndarray:
    S = _sign_matrix(X.shape[1], 4)
    return np.round((X @ S) / 2.0, 6)  # sqrt(4) = 2


def test_dbscan_grid_matches_brute_force_on_blobs():
    rng = np.random.default_rng(13)
    c1 = rng.normal(0, 0.3, (25, 16))
    c2 = rng.normal(0, 0.3, (25, 16)) + 4.0
    noise = rng.uniform(-10, 10, (10, 16))
    X = np.vstack([c1, c2, noise])
    ids = np.arange(len(X))
    ds = rd.from_pandas(pd.DataFrame({"vec_id": ids,
                                      "embedding": list(X)}))
    eps, min_pts = 2.0, 4
    out = dbscan_grid(ds, eps=eps, min_pts=min_pts,
                      num_partitions=4).to_pandas()
    got = dict(zip(out["vec_id"], out["cluster"]))
    want = _brute_force_dbscan(_project(X), eps, min_pts, ids)
    assert got == want
    # the two blobs form at least two distinct non-noise clusters
    blobs = {want[i] for i in range(50)} - {-1}
    assert len(blobs) >= 2


def test_dbscan_grid_all_noise():
    rng = np.random.default_rng(7)
    X = rng.uniform(-100, 100, (30, 8))
    ds = rd.from_pandas(pd.DataFrame({"vec_id": np.arange(30),
                                      "embedding": list(X)}))
    out = dbscan_grid(ds, eps=0.05, min_pts=4,
                      num_partitions=2).to_pandas()
    assert (out["cluster"] == -1).all()


def test_dbscan_grid_single_dense_cluster():
    rng = np.random.default_rng(3)
    X = rng.normal(0, 0.05, (20, 8))
    ids = np.arange(100, 120)
    ds = rd.from_pandas(pd.DataFrame({"vec_id": ids,
                                      "embedding": list(X)}))
    out = dbscan_grid(ds, eps=1.0, min_pts=4,
                      num_partitions=2).to_pandas()
    assert set(out["cluster"]) == {100}
