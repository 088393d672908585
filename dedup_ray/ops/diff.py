"""Corpus snapshot diff: added / removed / changed / same per document id
between two crawl versions — the delta pass an incremental pipeline runs
before deciding what to re-extract, re-sign and re-cluster (the
``pipelines/incremental.py`` shard mode consumes exactly the ``added`` +
``changed`` slice).

ONE co-partitioned exchange on the id; inside a partition both sides'
rows are present, so ``changed`` compares the TEXT ITSELF (no digest
collision caveat) via a vectorized sorted-id alignment.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from dedup_ray.util.exchange import hash_exchange


def corpus_diff(old_ds, new_ds, id_col: str = "doc_id",
                text_col: str = "text", num_partitions: int = 16):
    """``(id_col, status)`` with status in
    ``{'added', 'removed', 'changed', 'same'}``.

    ``added``/``removed`` are relative to the NEW snapshot (present only
    in new / only in old).  Ids are assumed unique per snapshot (crawl
    key = canonical url); duplicate ids compare positionally after an id
    sort and are reported per occurrence.
    """

    def reduce_fn(t_old: pa.Table, t_new: pa.Table) -> pa.Table:
        def frame(t):
            if t.num_rows == 0:
                return pd.DataFrame({id_col: [], text_col: []})
            texts = [s if s is not None else ""  # null text == empty page
                     for s in t[text_col].to_pylist()]
            return pd.DataFrame({
                id_col: t[id_col].to_numpy(zero_copy_only=False),
                text_col: pd.Series(texts, dtype=object),
            })

        m = frame(t_old).merge(frame(t_new), on=id_col, how="outer",
                               suffixes=("_old", "_new"), sort=True,
                               indicator=True)
        o = m[f"{text_col}_old"]
        n = m[f"{text_col}_new"]
        status = np.where(
            m["_merge"] == "right_only", "added",
            np.where(m["_merge"] == "left_only", "removed",
                     np.where(o != n, "changed", "same")))
        id_type = pa.int64()
        for t in (t_new, t_old):
            if id_col in t.column_names:
                id_type = t[id_col].type
                break
        return pa.table({
            id_col: pa.array(m[id_col].to_numpy(), id_type),
            "status": pa.array(status, pa.string()),
        })

    return hash_exchange([old_ds, new_ds], [id_col, id_col], reduce_fn,
                         num_partitions)


def psi_drift(ds_a, ds_b, value_col: str, lo: float, hi: float,
              n_buckets: int = 10, eps: float = 1e-6,
              round_digits: int = 6):
    """Population Stability Index between two snapshots of a value
    distribution — the drift monitor a recurring-crawl pipeline runs
    before trusting this month's quality thresholds on last month's
    calibration (PSI < 0.1 stable, > 0.25 shifted, by the usual
    credit-scoring convention).

    Fixed-width buckets over ``[lo, hi)`` (out-of-range values clamp to
    the edge buckets; nulls drop) — fixed edges rather than quantile
    edges so the operator is deterministic and the oracle replays it
    from the same constants.  One vectorized histogram pass per
    snapshot; driver state = 2×``n_buckets`` ints.  Per-bucket
    ``contrib = (p_a − p_b)·ln(p_a / p_b)`` with proportions floored at
    ``eps`` (the standard empty-bucket smoothing); PSI = Σ contrib.
    Output: one row per bucket ``(bucket, n_a, n_b, contrib)`` plus the
    replayable total in every row (``psi``).
    """
    import pyarrow.compute as pc  # noqa: F401  (signature parity)

    w = (hi - lo) / n_buckets

    def hist(ds):
        def partial(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"bucket": pa.array([], pa.int64()),
                                 "c": pa.array([], pa.int64())})
            v = t[value_col].to_numpy(zero_copy_only=False)
            v = v[~np.isnan(v.astype(np.float64))]
            b = np.clip(np.floor((v - lo) / w), 0,
                        n_buckets - 1).astype(np.int64)
            u, c = np.unique(b, return_counts=True)
            return pa.table({"bucket": pa.array(u, pa.int64()),
                             "c": pa.array(c, pa.int64())})

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        out = np.zeros(n_buckets, np.int64)
        if len(parts):
            g = parts.groupby("bucket")["c"].sum()
            out[g.index.to_numpy()] = g.to_numpy()
        return out

    na, nb = hist(ds_a), hist(ds_b)
    ta, tb = max(na.sum(), 1), max(nb.sum(), 1)
    p_a = np.maximum(na / ta, eps)
    p_b = np.maximum(nb / tb, eps)
    contrib = np.round((p_a - p_b) * np.log(p_a / p_b), round_digits)
    psi = round(float(contrib.sum()), round_digits)
    return pa.table({
        "bucket": pa.array(np.arange(n_buckets), pa.int64()),
        "n_a": pa.array(na), "n_b": pa.array(nb),
        "contrib": pa.array(contrib, pa.float64()),
        "psi": pa.array(np.full(n_buckets, psi), pa.float64()),
    })
