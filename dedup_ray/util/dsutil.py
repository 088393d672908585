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
