"""Distributed dense-matrix reductions over an embedding column.

The Gram matrix ``G = Xᵀ X`` (and with the column-sum vector, the
covariance) is the reduction behind embedding whitening, PCA projection
and linear probes over a corpus-scale vector column.  The reduction is
a TRUE combiner: per-batch ``XᵀX`` partials are d×d regardless of batch
size, so the driver/combine state is O(d²) — never O(rows).

Exactness: embeddings are scaled to int64 (``floor(x·scale + 0.5)``,
identical in numpy and SQL), so every Gram entry is an exact integer
sum — the DuckDB oracle reproduces the matrix value-for-value with no
float-association caveat.  Downstream spectral steps (power iteration)
run on the d×d result on the driver, where whole-matrix state is a few
KB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def gram_matrix(ds, vec_col: str, scale: float = 1e6,
                with_sums: bool = True):
    """Exact upper-triangle Gram matrix of the int64-scaled embedding
    column: rows ``(i, j, g)`` for ``i ≤ j`` (1-based dims to match SQL
    ``generate_subscripts``), plus ``(i, 0, s_i)`` column-sum rows when
    ``with_sums`` (j=0 flags a sum row; sums turn the Gram into a
    covariance on the driver without a second corpus pass).

    One ``map_batches`` partial pass (each emits at most d(d+1)/2 + d
    rows) + one single-partition combine whose input is bounded by
    batches × d², never by corpus rows.
    """
    from dedup_ray.util.dsutil import partitioned_group_apply

    def partial(t: pa.Table) -> pa.Table:
        col = t[vec_col]
        flat = col.combine_chunks().flatten() if isinstance(
            col, pa.ChunkedArray) else col.flatten()
        x = flat.to_numpy(zero_copy_only=False)
        d = len(x) // max(t.num_rows, 1) if t.num_rows else 0
        if not t.num_rows or not d:
            return pa.table({"i": pa.array([], pa.int64()),
                             "j": pa.array([], pa.int64()),
                             "g": pa.array([], pa.int64())})
        # float32 → float64 BEFORE scaling (exact), matching the SQL
        # ::DOUBLE cast — scaling in float32 would round differently
        xs = np.floor(x.astype(np.float64) * scale + 0.5) \
            .astype(np.int64).reshape(-1, d)
        g = xs.T @ xs
        iu, ju = np.triu_indices(d)
        rows = {"i": iu.astype(np.int64) + 1, "j": ju.astype(np.int64) + 1,
                "g": g[iu, ju]}
        if with_sums:
            rows = {"i": np.r_[rows["i"], np.arange(1, d + 1)],
                    "j": np.r_[rows["j"], np.zeros(d, dtype=np.int64)],
                    "g": np.r_[rows["g"], xs.sum(axis=0)]}
        return pa.table({k: pa.array(v) for k, v in rows.items()})

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["i", "j"], sort=False)["g"].sum().reset_index()
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out

    return partitioned_group_apply(partials, ["i"], combine,
                                   num_partitions=1)


def covariance_from_gram(gram_df: pd.DataFrame, n_rows: int,
                         scale: float = 1e6) -> np.ndarray:
    """Dense (d×d) sample covariance from :func:`gram_matrix` output
    (driver-side; input is O(d²) rows).  Uses ``cov = (G − s sᵀ/n) /
    (n−1)`` over the exact integer Gram and sum entries, descaled."""
    sums = gram_df[gram_df["j"] == 0].set_index("i")["g"]
    tri = gram_df[gram_df["j"] > 0]
    d = int(sums.index.max())
    g = np.zeros((d, d), dtype=np.float64)
    i = tri["i"].to_numpy() - 1
    j = tri["j"].to_numpy() - 1
    g[i, j] = tri["g"].to_numpy()
    g[j, i] = tri["g"].to_numpy()
    s = sums.sort_index().to_numpy().astype(np.float64)
    cov = (g - np.outer(s, s) / n_rows) / (n_rows - 1)
    return cov / (scale * scale)


def power_iteration(mat: np.ndarray, iters: int = 200,
                    tol: float = 1e-12) -> tuple[float, np.ndarray]:
    """Top eigenpair of a symmetric PSD matrix by deterministic power
    iteration (start vector = all-ones — no RNG, so the result is
    reproducible at any parallelism).  Driver-side: the input is the
    d×d reduction, never corpus data."""
    v = np.ones(mat.shape[0]) / np.sqrt(mat.shape[0])
    lam = 0.0
    for _ in range(iters):
        w = mat @ v
        nrm = np.linalg.norm(w)
        if nrm == 0.0:
            return 0.0, v
        w /= nrm
        lam_new = float(w @ mat @ w)
        if abs(lam_new - lam) <= tol * max(abs(lam_new), 1.0):
            return lam_new, w
        lam, v = lam_new, w
    return lam, v


def geometric_median(ds, vec_col: str = "embedding", iterations: int = 8,
                     eps: float = 1e-9):
    """Weiszfeld geometric median of an embedding column — the robust
    center a contaminated corpus needs where the mean chases outliers —
    run a FIXED ``iterations`` rounds from the mean (both engines
    unroll the same count; convergence is never assumed):
    ``μ' = Σ(x_i/d_i) / Σ(1/d_i)``, ``d_i = max(‖x_i−μ‖, eps)``.

    Each round is one streaming pass of (d+1)-float partials — the
    corpus never concentrates anywhere; the driver holds two
    d-vectors.  Output: ``(dim, value)`` 1-based, 6 dp."""
    import numpy as np
    import pyarrow as pa

    from dedup_ray.stages.embed import _batch_matrix

    ds = ds.materialize()  # 9 passes ride cached blocks, not re-reads

    # round 0: the mean (one pass)
    def mean_partial(t: pa.Table) -> pa.Table:
        X = _batch_matrix(t[vec_col])
        return pa.table({
            "s": pa.array(X.sum(axis=0), pa.float64()),
            "n": pa.array([float(len(X))] * X.shape[1], pa.float64()),
        })

    p = ds.map_batches(mean_partial, batch_format="pyarrow").to_pandas()
    # every block emits exactly `dim` rows; read dim from one row's vec
    first = _batch_matrix(
        next(iter(ds.limit(1).iter_batches(
            batch_size=1, batch_format="pyarrow")))[vec_col])
    dim = first.shape[1]
    arr = p["s"].to_numpy().reshape(-1, dim)
    ns = p["n"].to_numpy().reshape(-1, dim)[:, 0]
    mu = arr.sum(axis=0) / ns.sum()

    for _ in range(iterations):
        def witer(t: pa.Table, mu=mu) -> pa.Table:
            X = _batch_matrix(t[vec_col])
            d = np.sqrt(((X - mu[None, :]) ** 2).sum(axis=1))
            d = np.maximum(d, eps)
            return pa.table({
                "s": pa.array((X / d[:, None]).sum(axis=0), pa.float64()),
                "w": pa.array([float((1.0 / d).sum())] * X.shape[1],
                              pa.float64()),
            })

        q = ds.map_batches(witer, batch_format="pyarrow").to_pandas()
        s = q["s"].to_numpy().reshape(-1, dim).sum(axis=0)
        w = q["w"].to_numpy().reshape(-1, dim)[:, 0].sum()
        mu = s / w

    return pa.table({
        "dim": pa.array(np.arange(1, dim + 1), pa.int64()),
        "value": pa.array(np.round(mu, 6), pa.float64()),
    })
