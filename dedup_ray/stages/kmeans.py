"""Distributed Lloyd k-means over an embedding column.

SemDeDup/IVF train their centroids on a bounded driver-side SAMPLE
(``stages/semdedup.py``, ``stages/ann.py``) — good enough for routing, but
not the estimator a corpus-level clustering wants.  This module is the
full-corpus iteration: every round the ENTIRE dataset contributes to the
centroid update through per-batch partial sums, and nothing
corpus-sized ever reaches the driver.

Per round (classic Lloyd, Lloyd 1982 / MacQueen 1967):

- centroids (k × d float64) broadcast once via ``ray.put``;
- one ``map_batches`` pass: squared-distance argmin (ties → lowest
  cluster id) fully vectorized (``|x|² − 2XCᵀ + |c|²`` as one matmul),
  emitting ≤ k partial rows per batch: (cluster, count, per-dim sums);
- one tiny exchange groups the partials by cluster and sums; the k
  updated centroids (k·d floats — bounded state) return to the driver.

An empty cluster keeps its previous centroid (the deterministic
convention the unrolled SQL oracle can replay).  Init is the k vectors
with the smallest ids — deterministic and engine-independent, unlike
random or kmeans++ seeding.  Output: ``(id_col, cluster)`` assignments
under the FINAL centroids.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _vecs(col) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _assign(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Squared-Euclidean argmin row per X row; ties → lowest cluster id."""
    d2 = (
        (X * X).sum(axis=1)[:, None]
        - 2.0 * (X @ C.T)
        + (C * C).sum(axis=1)[None, :]
    )
    return np.argmin(d2, axis=1).astype(np.int64)


def kmeans_lloyd(ds, id_col: str = "vec_id", vec_col: str = "embedding",
                 k: int = 4, rounds: int = 2, num_partitions: int = 4):
    """``rounds`` × (assign, update), then final assignment.

    Returns ``(assignments_ds, centroids)`` — the Dataset of
    ``(id_col, cluster)`` rows and the final (k, d) float64 centroid
    matrix (bounded driver state by construction).
    """
    from dedup_ray.util.exchange import exchange_group_apply

    ds = ds.materialize()  # rounds re-scan the input; pin it once

    # ---- deterministic init: the k smallest-id vectors ----------------
    def smallest_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select([id_col, vec_col])
        ids = t[id_col].to_numpy(zero_copy_only=False)
        keep = np.sort(np.argsort(ids, kind="stable")[:k])
        return t.select([id_col, vec_col]).take(pa.array(keep))

    # ≤ k rows per input block reach the driver — bounded by construction
    seed_df = ds.map_batches(
        smallest_partial, batch_format="pyarrow").to_pandas()
    if id_col in seed_df.columns and len(seed_df):
        seed_df = seed_df.sort_values(id_col, kind="stable").head(k)
        C = np.stack(seed_df[vec_col].to_numpy()).astype(np.float64)
    else:  # empty corpus: void-schema blocks carry no columns at all
        C = np.zeros((0, 0))
    if C.shape[0] == 0:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "cluster": pa.array([], pa.int64())})
        import ray.data as _rd  # alias: plain `import ray.data` would
        return _rd.from_arrow(empty), C  # shadow module-level `ray`

    d = C.shape[1]

    for _ in range(rounds):
        c_ref = ray.put(C)

        def partial(t: pa.Table, _c=c_ref) -> pa.Table:
            Cb = ray.get(_c) if isinstance(_c, ray.ObjectRef) else _c
            if t.num_rows == 0:
                return pa.table({
                    "cluster": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                    "sums": pa.array([], pa.list_(pa.float64())),
                })
            X = _vecs(t[vec_col])
            a = _assign(X, Cb)
            sums = np.zeros((k, d), np.float64)
            np.add.at(sums, a, X)
            cnt = np.bincount(a, minlength=k).astype(np.int64)
            live = np.flatnonzero(cnt)
            return pa.table({
                "cluster": pa.array(live, pa.int64()),
                "cnt": pa.array(cnt[live], pa.int64()),
                "sums": pa.array(list(sums[live]), pa.list_(pa.float64())),
            })

        def combine(part: pa.Table) -> pa.Table:
            if part.num_rows == 0 or "cluster" not in part.column_names:
                return pa.table({
                    "cluster": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                    "sums": pa.array([], pa.list_(pa.float64())),
                })
            cl = part["cluster"].to_numpy(zero_copy_only=False)
            cnt = part["cnt"].to_numpy(zero_copy_only=False)
            S = _vecs(part["sums"])
            uniq = np.unique(cl)
            acc = np.zeros((len(uniq), d), np.float64)
            n_acc = np.zeros(len(uniq), np.int64)
            idx = np.searchsorted(uniq, cl)
            np.add.at(acc, idx, S)
            np.add.at(n_acc, idx, cnt)
            return pa.table({
                "cluster": pa.array(uniq, pa.int64()),
                "cnt": pa.array(n_acc, pa.int64()),
                "sums": pa.array(list(acc), pa.list_(pa.float64())),
            })

        agg = exchange_group_apply(
            ds.map_batches(partial, batch_format="pyarrow"),
            "cluster", combine, min(num_partitions, k),
        ).to_pandas()  # ≤ k rows — bounded by construction
        newC = C.copy()  # empty clusters keep their centroid
        for _, row in agg.iterrows():
            c = int(row["cluster"])
            newC[c] = np.asarray(row["sums"], np.float64) / row["cnt"]
        C = newC

    c_final = ray.put(C)

    def assign_final(t: pa.Table, _c=c_final) -> pa.Table:
        Cb = ray.get(_c) if isinstance(_c, ray.ObjectRef) else _c
        if t.num_rows == 0:
            return pa.table({id_col: t[id_col] if id_col in t.column_names
                             else pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64())})
        a = _assign(_vecs(t[vec_col]), Cb)
        return pa.table({id_col: t[id_col],
                         "cluster": pa.array(a, pa.int64())})

    return ds.map_batches(assign_final, batch_format="pyarrow"), C
