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


def rename_columns(ds, mapping: dict[str, str]):
    """Streaming column rename (columns absent from ``mapping`` pass
    through unchanged)."""
    import pyarrow as pa

    def f(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            [mapping.get(c, c) for c in batch.column_names]
        )

    return ds.map_batches(f, batch_format="pyarrow")


def pin_edge_ids(ds, id_type):
    """Force ``(id1, id2)`` to the corpus id dtype so empty parts union
    cleanly.

    An edge path that found nothing yields zero-row pandas-born blocks
    whose columns type as Arrow ``null``; casting pins the schema so a
    lazy union (and a checkpoint parquet write) never sees a mismatch.
    """
    import pyarrow as pa

    def cast(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id1": t["id1"].combine_chunks().cast(id_type),
                "id2": t["id2"].combine_chunks().cast(id_type),
            }
        )

    return ds.select_columns(["id1", "id2"]).map_batches(
        cast, batch_format="pyarrow"
    )


def split_mixed_rows(mixed_ds, cols, want_edges: bool):
    """Split an ``exact_rep_partition``-style mixed Dataset into its edge
    rows (``id1`` valid) or payload rows (``id1`` null), selecting
    ``cols``."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        mask = pc.is_valid(t["id1"])
        if not want_edges:
            mask = pc.invert(mask)
        return t.filter(mask).select(cols)

    return mixed_ds.map_batches(f, batch_format="pyarrow")


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


def hash_join_arrow(
    left_ds,
    right_ds,
    on: str,
    left_cols: list[str],
    right_cols: list[str],
    types: dict,
    num_partitions: int = 16,
    how: str = "inner",
    left_prep=None,
):
    """Arrow-native co-partitioning equi-join (zero pandas boxing).

    Same plan as :func:`hash_join` (tag → union → one ``__part`` shuffle →
    per-partition merge) but blocks stay Arrow end to end and the
    per-partition merge is an Acero ``Table.join``.  For wide payloads
    (e.g. 1KB MinHash signatures) the pandas path boxes every cell into a
    Python object twice per round — this path never leaves Arrow buffers.

    ``types`` maps EVERY column of both sides to its ``pa.DataType`` so the
    tag step can emit typed null columns for the union (schemas of lazy
    Datasets are not probed).  ``left_prep``, if given, receives the left
    partition as a ``pa.Table``.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    all_cols = list(dict.fromkeys(left_cols + right_cols))

    def tag(side: int, cols: list[str]):
        def f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            out = {}
            for c in all_cols:
                if c in cols:
                    arr = batch[c].combine_chunks()
                    # fixed-width columns are declared (and carried) as
                    # VARIABLE-width: a typed null column of fixed width
                    # materializes full-width buffers on every sort/take of
                    # the shuffle; variable-width nulls cost zero bytes
                    if arr.type != types[c]:
                        arr = arr.cast(types[c])
                    out[c] = arr
                else:
                    out[c] = pa.nulls(n, type=types[c])
            h = pd.util.hash_pandas_object(
                batch[on].to_pandas(), index=False
            ).to_numpy(dtype=np.uint64)
            out["__side"] = pa.array(np.full(n, side, dtype=np.int8))
            out["__part"] = pa.array(
                (h % np.uint64(num_partitions)).astype(np.int64)
            )
            return pa.table(out)

        return f

    combined = left_ds.map_batches(tag(0, left_cols), batch_format="pyarrow").union(
        right_ds.map_batches(tag(1, right_cols), batch_format="pyarrow")
    )

    jt = {
        "inner": "inner",
        "left": "left outer",
        "semi": "left semi",
        "anti": "left anti",
    }[how]

    def merge(part: pa.Table) -> pa.Table:
        side = part["__side"]
        import pyarrow.compute as pc

        lf = part.filter(pc.equal(side, 0)).select(left_cols)
        if left_prep is not None:
            lf = left_prep(lf)
        rf = part.filter(pc.equal(side, 1)).select(right_cols)
        out = lf.join(rf, keys=on, join_type=jt)
        cols = (
            left_cols
            if how in ("semi", "anti")
            else list(dict.fromkeys(left_cols + right_cols))
        )
        return out.select(cols).combine_chunks()

    return combined.groupby("__part").map_groups(merge, batch_format="pyarrow")


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


def union_evolve(datasets: list, schemas: list[dict] | None = None):
    """Union datasets whose schemas differ (schema evolution across crawl
    generations): the unified schema is the ordered union of all column
    names; a dataset missing a column contributes typed nulls for it.

    ``schemas`` optionally pins ``{col: pa.DataType}`` per dataset (lazy
    Datasets are not probed); otherwise each dataset's ``schema()`` is
    read once.  Columns sharing a name must share a type (mismatches
    raise rather than silently cast — evolution means ADDING columns).
    Streaming: one ``map_batches`` per input, then ``Dataset.union``.
    """
    import pyarrow as pa

    if schemas is None:
        schemas = []
        for ds in datasets:
            s = ds.schema()
            schemas.append(dict(zip(s.names, s.types)))
    unified: dict = {}
    for sch in schemas:
        for name, typ in sch.items():
            if name in unified and unified[name] != typ:
                raise ValueError(
                    f"union_evolve: column {name!r} has conflicting types "
                    f"{unified[name]} vs {typ}"
                )
            unified.setdefault(name, typ)

    def align(cols_present: dict):
        def f(batch: pa.Table) -> pa.Table:
            arrays = []
            for name, typ in unified.items():
                if name in cols_present:
                    arrays.append(batch[name])
                else:
                    arrays.append(pa.nulls(batch.num_rows, typ))
            return pa.table(dict(zip(unified.keys(), arrays)))

        return f

    aligned = [
        ds.map_batches(align(sch), batch_format="pyarrow")
        for ds, sch in zip(datasets, schemas)
    ]
    out = aligned[0]
    for ds in aligned[1:]:
        out = out.union(ds)
    return out


def table_checksum(ds, cols: list[str], seed: int = 0):
    """Order-insensitive content checksum of selected columns: per row,
    md5 of the ``'|'``-joined string forms (first 8 hex as int), summed
    over the table — mergeable across partitions/batches, independent of
    row order and partitioning, and recomputable by any engine (the audit
    primitive for "did two runs produce the same table" without moving
    either table).  Restricted to int/string columns by contract: float
    formatting differs across engines, so floats must be rounded into
    strings upstream first.  Returns a 1-row ``pa.Table``
    ``(n_rows, checksum)``.
    """
    import numpy as np
    import pyarrow as pa

    from dedup_ray.util.hashing import content_digest

    def partial(t: pa.Table) -> pa.Table:
        parts = [[str(v) for v in t[c].to_pylist()] for c in cols]
        joined = [f"{seed}|" + "|".join(vals) for vals in zip(*parts)]
        h = np.array([int(d[:8], 16) for d in
                      content_digest(joined, algo="md5")], np.int64)
        return pa.table({"n": pa.array([t.num_rows], pa.int64()),
                         "s": pa.array([int(h.sum())], pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow")
    return pa.table({
        "n_rows": pa.array([agg.sum("n") or 0], pa.int64()),
        "checksum": pa.array([agg.sum("s") or 0], pa.int64()),
    })
