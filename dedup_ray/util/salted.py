"""Salted two-phase aggregation: the skew policy for HOT-KEY aggregates.

``partitioned_group_apply`` co-locates each key on one partition — required
when the per-group computation needs all rows together (pair emission,
keep-first).  But for ALGEBRAIC aggregates (sum/count/min/max) a
pathologically hot key need not be co-located at all: salt the shuffle key
with ``hash(row) % salt`` so a hot key's rows spread over ``salt``
partitions, combine per (key, salt) shard, then run a second tiny exchange
over the shard partials keyed on the key alone.  The second shuffle moves
at most ``salt`` rows per distinct key — corpus-scale row counts never
converge on one reducer.

This is the "salted repartitioning" treatment for skewed aggregation; the
pair-generation stages use the complementary policy (bounded per-group
work via hot-bucket caps, ``stages/lsh.py``) because pair semantics cannot
be salted.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def salted_group_agg(ds, key_cols: list[str], agg_spec: dict[str, tuple],
                     salt: int = 8, num_partitions: int = 16):
    """Grouped algebraic aggregation robust to hot keys.

    ``agg_spec``: ``{out_col: (in_col, how)}`` with ``how`` in
    ``{"sum", "count", "min", "max"}``.  Returns one row per distinct key.
    Result is identical to an unsalted groupby — verified by test — but no
    single reducer ever sees more than ``salt × num_groups_per_partition``
    partial rows regardless of key skew.
    """
    from dedup_ray.util.dsutil import as_arrow, partitioned_group_apply

    mergeable = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for how in (v[1] for v in agg_spec.values()):
        if how not in mergeable:
            raise ValueError(f"non-algebraic aggregate: {how}")

    def add_salt(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__salt"] = np.arange(len(batch), dtype=np.int64) % salt
        return batch

    def shard_partials(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(key_cols + ["__salt"], sort=False)
        out = pd.DataFrame(index=g.size().index)
        for out_col, (in_col, how) in agg_spec.items():
            if how == "count":
                # SQL count(col) semantics: nulls excluded (g.size() would
                # count rows, contradicting the (in_col, "count") spec)
                out[out_col] = g[in_col].count()
            else:
                out[out_col] = g[in_col].agg(how)
        return out.reset_index().drop(columns="__salt")

    salted = ds.map_batches(add_salt, batch_format="pandas")
    partials = partitioned_group_apply(
        salted, key_cols + ["__salt"], shard_partials, num_partitions
    )

    def merge_shards(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(key_cols, sort=False)
        out = pd.DataFrame(index=g.size().index)
        for out_col, (_in, how) in agg_spec.items():
            out[out_col] = g[out_col].agg(mergeable[how])
        return out.reset_index()

    return as_arrow(partitioned_group_apply(
        partials, key_cols, merge_shards, num_partitions
    ))
