"""Small Dataset helpers shared across stages."""

from __future__ import annotations


def as_arrow(ds):
    """Normalize a Dataset to Arrow blocks.

    ``groupby().map_groups(..., batch_format="pandas")`` emits pandas blocks;
    mixing them with Arrow blocks breaks ``union``/``iter_batches`` batch
    assembly.  An identity ``map_batches`` with ``batch_format="pyarrow"``
    re-encodes the blocks (cheap, streaming).
    """
    return ds.map_batches(lambda t: t, batch_format="pyarrow")


def partitioned_group_apply(ds, key_cols: list[str], fn, num_partitions: int = 16):
    """Hash-partition by key columns, then apply ``fn`` per PARTITION.

    ``Dataset.groupby(keys).map_groups`` dispatches one Python call per
    group — ruinous when groups number in the tens of thousands (LSH band
    buckets, pair dedup).  This helper shuffles on ``hash(key) %
    num_partitions`` so every group lands whole in exactly one partition,
    then calls ``fn(partition_df)`` once per partition; ``fn`` does its own
    vectorized ``partition_df.groupby(key_cols)``.  Semantics identical,
    dispatch cost O(num_partitions) instead of O(num_groups).

    Skew note: a pathologically hot key confines its group to one partition
    by necessity; bound the per-group WORK (e.g. lsh hot-bucket caps) rather
    than the partition count.
    """
    import pandas as pd

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(batch[key_cols], index=False)
        batch = batch.copy()
        batch["__part"] = (h % num_partitions).astype("int64")
        return batch

    def apply_part(group: pd.DataFrame) -> pd.DataFrame:
        return fn(group.drop(columns="__part"))

    parts = ds.map_batches(add_part, batch_format="pandas")
    return as_arrow(
        parts.groupby("__part").map_groups(apply_part, batch_format="pandas")
    )


def hash_join(
    left_ds,
    right_ds,
    on: str,
    left_cols: list[str],
    right_cols: list[str],
    num_partitions: int = 16,
    how: str = "inner",
    left_prep=None,
):
    """Equi-join via ONE co-partitioning shuffle — no aggregator actor pools.

    ``Dataset.join`` spawns ``num_partitions`` hash-shuffle aggregator actors
    per join, each reserving a CPU fraction sized off the whole cluster;
    several joins fused into one streaming plan can reserve more CPU than the
    cluster has and starve each other (observed as a full-pipeline hang).
    This helper instead tags each side, unions them into one schema-aligned
    stream, hash-partitions on the key via the sort-based shuffle (plain
    tasks, composable and backpressured), and pandas-merges within each
    partition.  Both ``on`` columns must share a name (rename first).

    ``left_cols`` / ``right_cols`` are the full column lists of each side
    (schemas of lazy Datasets are not probed); non-key columns must not
    collide.
    """
    import numpy as np
    import pandas as pd

    all_cols = list(dict.fromkeys(left_cols + right_cols))

    def tag(side: int, cols: list[str]):
        def f(batch: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({c: batch[c] if c in cols else None for c in all_cols})
            out["__side"] = np.int8(side)
            h = pd.util.hash_pandas_object(batch[on], index=False)
            out["__part"] = (h % num_partitions).astype("int64")
            return out

        return f

    combined = left_ds.map_batches(tag(0, left_cols), batch_format="pandas").union(
        right_ds.map_batches(tag(1, right_cols), batch_format="pandas")
    )

    def merge(part: pd.DataFrame) -> pd.DataFrame:
        lf = part[part["__side"] == 0][left_cols]
        if left_prep is not None:
            # partition-local preprocessing that is globally correct when
            # its key set includes `on` (e.g. drop_duplicates on (on, x):
            # all rows of one `on` key co-locate here) — lets callers fuse
            # a dedup that would otherwise cost its own shuffle
            lf = left_prep(lf)
        rf = part[part["__side"] == 1][right_cols]
        if how == "anti":  # left rows with no key match on the right
            return lf[~lf[on].isin(set(rf[on]))]
        if how == "semi":  # left rows with at least one key match
            return lf[lf[on].isin(set(rf[on]))]
        return lf.merge(rf, on=on, how=how)

    return as_arrow(
        combined.groupby("__part").map_groups(merge, batch_format="pandas")
    )
