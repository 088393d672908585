"""Distributed Lloyd k-means vs a local numpy reference."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from dedup_ray.stages.kmeans import _assign, kmeans_lloyd


def _local_lloyd(X, ids, k, rounds):
    order = np.argsort(ids, kind="stable")[:k]
    C = X[order].astype(np.float64)
    for _ in range(rounds):
        a = _assign(X, C)
        newC = C.copy()
        for c in range(k):
            m = a == c
            if m.any():
                newC[c] = X[m].mean(axis=0)
        C = newC
    return _assign(X, C), C


def _make_blobs(seed=3, n=240, d=8, k=3, spread=0.05):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 5, size=(k, d))
    labels = rng.integers(0, k, size=n)
    X = centers[labels] + rng.normal(0, spread, size=(n, d))
    ids = rng.permutation(n).astype(np.int64)
    return X.astype(np.float64), ids, labels


def _ds(X, ids, parts=5):
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([list(map(float, r)) for r in X],
                              pa.list_(pa.float64())),
    })).repartition(parts)


def test_kmeans_matches_local_reference_and_partitioning():
    X, ids, _ = _make_blobs()
    want_a, want_C = _local_lloyd(X, ids, k=3, rounds=3)
    for parts, nparts in [(2, 2), (7, 3)]:
        got, C = kmeans_lloyd(_ds(X, ids, parts), k=3, rounds=3,
                              num_partitions=nparts)
        df = got.to_pandas().set_index("vec_id")
        order = np.argsort(ids)
        assert (df.loc[ids, "cluster"].to_numpy() == want_a).all()
        assert np.allclose(C, want_C, atol=1e-12)
        del order


def test_kmeans_recovers_planted_blobs():
    X, ids, labels = _make_blobs(seed=9, spread=0.01)
    got, _ = kmeans_lloyd(_ds(X, ids), k=3, rounds=4)
    df = got.to_pandas()
    m = dict(zip(df["vec_id"], df["cluster"]))
    pred = np.array([m[i] for i in ids])
    # tight blobs: predicted partition == planted partition (up to relabel)
    for c in range(3):
        assert len(set(pred[labels == c])) == 1
    assert len({pred[labels == c][0] for c in range(3)}) == 3


def test_kmeans_empty_cluster_keeps_centroid():
    # k=3 but only two distinct points: the never-assigned seed centroid
    # must survive the update untouched
    X = np.array([[0.0, 0.0], [0.0, 0.0], [10.0, 10.0], [10.0, 10.0]])
    ids = np.arange(4, dtype=np.int64)
    got, C = kmeans_lloyd(_ds(X, ids, parts=2), k=3, rounds=2)
    assert C.shape == (3, 2)
    # seeds are ids 0,1,2 -> vectors [0,0],[0,0],[10,10]; cluster 1 is a
    # duplicate seed that never wins an argmin (ties go to cluster 0)
    assert np.allclose(C[1], [0.0, 0.0])
    df = got.to_pandas()
    assert set(df["cluster"]) == {0, 2}


def test_kmeans_empty_input():
    empty = rd.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float64())),
    }))
    got, C = kmeans_lloyd(empty, k=2, rounds=1)
    assert got.count() == 0 and C.shape[0] == 0
