"""Relational building blocks (SURVEY.md §2.4/§2.5/§2.6/§2.9).

Reference semantics re-expressed on Ray Data:

- semi/anti joins (``lfilter.py:10-16`` J3, ``valid_index.py:12-13`` J4):
  broadcast the key set via ``ray.put`` and filter inside ``map_batches`` —
  no shuffle when the key side is small (the reference's case); a
  hash-partitioned ``Dataset.join`` fallback covers large key sides.
- broadcast left join (``combine-at.R:11-20`` J1, IDF lookup J5).
- canonical within-block pair generation (``c_org.py:30-31`` P1 /
  ``id_pairs.py:21-23``): pairs enumerate in lexicographic ``(id1 < id2)``
  order inside each block, as keyed rows — never positional.
- grouped collect-to-cluster (``venue_bag.py:11-15`` A4) and grouped mode
  (``uni_glue_baseline.R:26`` A6/O3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from dedup_ray.util.dsutil import as_arrow


# Above these bounds the key/small side stops being "small": broadcasting
# it (driver set / driver DataFrame + ray.put) would scale driver memory
# with the data, so the join degrades to the partitioned task-based
# ``dsutil.hash_join`` instead.  At 100 TB the key side of a semi-join is
# routinely corpus-sized; the broadcast path is the reference's case
# (``lfilter.py``/``valid_index.py`` key sets are tiny).
BROADCAST_KEY_LIMIT = 2_000_000
BROADCAST_ROW_LIMIT = 500_000


def _try_key_array(keys_ds, on: str, limit: int):
    """Distinct key values as one Arrow array, or None if > limit keys.

    Streams with an early bail-out: the driver never holds more than
    ~2×``limit`` candidate keys even when the key side is corpus-sized.
    Accumulation stays in Arrow (``pc.unique`` per batch, periodic
    compaction) — values are never boxed into Python objects.
    """
    import pyarrow.compute as pc

    parts: list[pa.Array] = []
    n_bound = 0  # upper bound on distinct keys held (sum of part lengths)
    for b in keys_ds.select_columns([on]).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        u = pc.unique(b[on].combine_chunks())
        parts.append(u)
        n_bound += len(u)
        if n_bound > limit:
            merged = pc.unique(pa.concat_arrays(
                [p.cast(u.type) for p in parts]))
            parts, n_bound = [merged], len(merged)
            if n_bound > limit:
                return None
    if not parts:
        return pa.array([])
    merged = pc.unique(pa.concat_arrays(
        [p.cast(parts[0].type) for p in parts]))
    return merged.sort()


def _membership_join(ds, keys_ds, on: str, keep_match: bool, cols, limit,
                     num_partitions):
    import ray

    key_arr = _try_key_array(keys_ds, on, limit)
    if key_arr is None:
        # large key side: partitioned task-based semi/anti (one co-partition
        # shuffle, no driver state) — identical semantics
        from dedup_ray.util.dsutil import hash_join

        if cols is None:
            cols = ds.schema().names  # may execute one block; fine vs OOM
        return hash_join(
            ds,
            keys_ds.select_columns([on]),
            on=on,
            left_cols=list(cols),
            right_cols=[on],
            num_partitions=num_partitions,
            how="semi" if keep_match else "anti",
        )
    ref = ray.put(key_arr)  # broadcast ONCE; workers read zero-copy

    def f(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.is_in(batch[on], value_set=ray.get(ref))
        if not keep_match:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return ds.map_batches(f, batch_format="pyarrow")


def semi_join(ds, keys_ds, on: str, cols: list[str] | None = None,
              broadcast_key_limit: int = BROADCAST_KEY_LIMIT,
              num_partitions: int = 16):
    """Keep rows whose ``on`` appears in keys_ds.

    Broadcast membership (vectorized ``pc.is_in``) while the distinct key
    count fits ``broadcast_key_limit``; above it, a hash-partitioned
    task-based semi join.  ``cols`` = the column list of ``ds`` (only needed
    on the partitioned path; probed from the schema when omitted).
    """
    return _membership_join(ds, keys_ds, on, True, cols, broadcast_key_limit,
                            num_partitions)


def anti_join(ds, keys_ds, on: str, cols: list[str] | None = None,
              broadcast_key_limit: int = BROADCAST_KEY_LIMIT,
              num_partitions: int = 16):
    """Keep rows whose ``on`` does NOT appear in keys_ds (same gating)."""
    return _membership_join(ds, keys_ds, on, False, cols, broadcast_key_limit,
                            num_partitions)


def broadcast_left_join(ds, small_df: pd.DataFrame, on: str):
    """Left join a small pandas side into every batch (J1/J5 pattern)."""
    import ray

    ref = ray.put(small_df)

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(ray.get(ref), on=on, how="left")

    return as_arrow(ds.map_batches(f, batch_format="pandas"))


def left_join(big_ds, small_ds, on: str, big_cols: list[str],
              small_cols: list[str],
              broadcast_row_limit: int = BROADCAST_ROW_LIMIT,
              num_partitions: int = 16):
    """big ⟕ small with size-gated strategy choice.

    Collects the right side to the driver and broadcasts it only while it
    fits ``broadcast_row_limit`` rows (streamed with early bail-out —
    never a full ``to_pandas`` of an unbounded side); otherwise both sides
    go through the partitioned task-based ``hash_join(how='left')``.
    """
    frames, total = [], 0
    for b in small_ds.iter_batches(batch_size=65536, batch_format="pandas"):
        frames.append(b)
        total += len(b)
        if total > broadcast_row_limit:
            frames = None
            break
    if frames is not None:
        small_df = (
            pd.concat(frames, ignore_index=True)
            if frames
            else pd.DataFrame(columns=small_cols)
        )
        return broadcast_left_join(big_ds, small_df[small_cols], on)
    from dedup_ray.util.dsutil import hash_join

    return hash_join(
        big_ds,
        small_ds,
        on=on,
        left_cols=list(big_cols),
        right_cols=list(small_cols),
        num_partitions=num_partitions,
        how="left",
    )


def skew_inner_join(left_ds, right_ds, on: str, left_cols: list[str],
                    right_cols: list[str], hot_row_threshold: int = 100_000,
                    salt: int = 8, num_partitions: int = 16):
    """Inner join that survives hot keys — the skew defense a plain
    hash-partitioned join lacks (one partition receives every row of a
    hot key; at web scale a single viral host key can be 10% of the
    corpus and that partition runs alone for hours).

    Three phases, all distributed:

    1. **Census**: per-batch key-count partials on the LEFT (big) side →
       one small grouped sum → keys whose row count exceeds
       ``hot_row_threshold`` come to the driver.  Driver state is
       inherently bounded: at most ``total_rows / hot_row_threshold``
       keys can exceed the threshold, so no cap is needed.
    2. **Cold path**: rows of non-hot keys on both sides take the normal
       co-partitioning ``hash_join`` — hot and cold key sets are
       disjoint, so the split loses no join pairs.
    3. **Hot path (salted replication)**: left hot rows get a salt in
       ``[0, salt)`` (round-robin within each batch — load balance only,
       never output-visible), right hot rows are replicated once per
       salt, and the join runs on the packed ``key:salt`` composite.
       Per-partition work for a hot key drops by ``1/salt`` at the cost
       of replicating only the hot slice of the small side.

    Output columns: ``left_cols`` + non-key ``right_cols`` (inner join
    semantics, exactly ``hash_join``'s result set in any row order).

    Both inputs are materialized up front: the left feeds the census AND
    both split paths (3 consumers), the right both split paths (2) — a
    lazy upstream would re-execute once per consumer (review finding
    r3).  The signature-table pattern: one materialize amortized over
    every downstream pass.
    """
    import numpy as np
    import pyarrow.compute as pc
    import ray

    from dedup_ray.util.dsutil import hash_join

    left_ds = left_ds.materialize()
    right_ds = right_ds.materialize()

    def census(t: pa.Table) -> pa.Table:
        g = t.select([on]).group_by(on).aggregate([([], "count_all")])
        return pa.table({on: g[on], "cnt": g["count_all"]})

    counts = (
        left_ds.map_batches(census, batch_format="pyarrow")
        .groupby(on).sum("cnt")
    )
    hot_parts = [
        b.select([on])
        for b in counts.map_batches(
            lambda t: t.filter(
                pc.greater(t["sum(cnt)"], hot_row_threshold)
            ).select([on]),
            batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow", batch_size=65536)
    ]
    hot_tbl = pa.concat_tables(hot_parts) if hot_parts else None

    out_cols = list(dict.fromkeys(left_cols + right_cols))
    if hot_tbl is None or hot_tbl.num_rows == 0:
        return hash_join(left_ds, right_ds, on, left_cols, right_cols,
                         num_partitions=num_partitions)
    hot_keys = hot_tbl[on].combine_chunks()

    hot_ref = ray.put(hot_keys)

    def split(keep_hot: bool):
        def f(t: pa.Table) -> pa.Table:
            mask = pc.is_in(t[on], value_set=ray.get(hot_ref))
            return t.filter(mask if keep_hot else pc.invert(mask))
        return f

    cold = hash_join(
        left_ds.map_batches(split(False), batch_format="pyarrow"),
        right_ds.map_batches(split(False), batch_format="pyarrow"),
        on, left_cols, right_cols, num_partitions=num_partitions,
    )

    def salt_left(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t[on], value_set=ray.get(hot_ref)))
        s = np.arange(t.num_rows, dtype=np.int64) % salt
        packed = pc.binary_join_element_wise(
            pc.cast(t[on], pa.string()),
            pa.array(s.astype("U"), pa.string()), ":")
        return t.append_column("__ks", packed)

    def replicate_right(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t[on], value_set=ray.get(hot_ref)))
        reps = []
        for s in range(salt):
            packed = pc.binary_join_element_wise(
                pc.cast(t[on], pa.string()),
                pa.scalar(str(s)), ":")
            reps.append(t.append_column("__ks", packed))
        return pa.concat_tables(reps) if reps else t

    hot = hash_join(
        left_ds.map_batches(salt_left, batch_format="pyarrow"),
        right_ds.map_batches(replicate_right, batch_format="pyarrow"),
        "__ks", left_cols + ["__ks"],
        ["__ks"] + [c for c in right_cols if c != on],
        num_partitions=num_partitions,
    ).map_batches(
        lambda t: t.select(out_cols), batch_format="pyarrow",
    )
    return as_arrow(cold).map_batches(
        lambda t: t.select(out_cols), batch_format="pyarrow",
    ).union(hot)


def bloom_semi_join(big_ds, keys_ds, on: str, big_cols: list[str],
                    bits_log2: int = 24, k: int = 4,
                    num_partitions: int = 16):
    """Semi join where the key side is too big to broadcast EXACTLY but a
    fixed-size Bloom filter of it fits anywhere — the classic
    exchange-shrinking join optimization.

    1. The key side streams through the driver ONCE as vectorized 64-bit
       hashes OR-ed into a ``2^bits_log2``-bit Bloom (2 MB at the default
       regardless of key count — driver memory is the filter size, fixed,
       unlike the exact broadcast set that grows 8 B+/key).
    2. The Bloom broadcasts via ``ray.put``; the big side drops every row
       whose key cannot be present (no false negatives, so no lost rows)
       BEFORE the shuffle — the exchange then moves only plausible
       matches instead of the whole table.
    3. The surviving slice takes the exact partitioned semi join, which
       removes Bloom false positives; output EQUALS the plain semi join.

    Use :func:`semi_join` when the distinct key count fits the broadcast
    limit (exact filter, no second pass); this operator is the regime
    above it.
    """
    import ray

    from dedup_ray.stages.sketch import bloom_build, bloom_contains
    from dedup_ray.util.dsutil import hash_join
    from dedup_ray.util.exchange import _key_hash

    words = None
    for b in keys_ds.select_columns([on]).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        col = b[on]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        part = bloom_build(_key_hash(col), bits_log2=bits_log2, k=k)
        words = part if words is None else (words | part)
    if words is None:  # empty key side: semi join is empty
        return big_ds.map_batches(
            lambda t: t.select(big_cols).slice(0, 0),
            batch_format="pyarrow",
        )
    ref = ray.put(words)

    def prefilter(t: pa.Table) -> pa.Table:
        col = t[on]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        mask = bloom_contains(ray.get(ref), _key_hash(col), k=k)
        return t.select(big_cols).filter(pa.array(mask))

    survivors = big_ds.map_batches(prefilter, batch_format="pyarrow")
    return hash_join(
        survivors, keys_ds.select_columns([on]), on,
        big_cols, [on], num_partitions=num_partitions, how="semi",
    )


def block_pairs(ds, block_col: str, id_col: str, value_cols: list[str] | None = None):
    """P1: all C(n,2) canonical pairs within each block, as keyed rows.

    Output columns: block_col, id1, id2 (+ ``<col>_1``/``<col>_2`` for each
    requested value column).  Order inside a block is lexicographic on the
    *distinct sorted* ids — the exact enumeration of pandas
    ``groupby('id')`` + ``itertools.combinations`` in the reference.
    """
    value_cols = value_cols or []

    def gen(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(subset=[id_col]).sort_values(id_col)
        n = len(g)
        if n < 2:
            cols = {block_col: [], "id1": [], "id2": []}
            for c in value_cols:
                cols[f"{c}_1"] = []
                cols[f"{c}_2"] = []
            return pd.DataFrame(cols)
        i1, i2 = np.triu_indices(n, 1)
        out = {
            block_col: [group[block_col].iloc[0]] * len(i1),
            "id1": g[id_col].to_numpy()[i1],
            "id2": g[id_col].to_numpy()[i2],
        }
        for c in value_cols:
            out[f"{c}_1"] = g[c].to_numpy()[i1]
            out[f"{c}_2"] = g[c].to_numpy()[i2]
        return pd.DataFrame(out)

    return as_arrow(ds.groupby(block_col).map_groups(gen, batch_format="pandas"))


def group_collect(ds, key_col: str, id_col: str):
    """A4: exact-key clustering — each key's members get cluster_rep = min id.

    Output (key, id, cluster_rep, cluster_size): the keyed, orderless
    encoding of ``groupby(key)['id'].apply(list)``.
    """

    def collect(group: pd.DataFrame) -> pd.DataFrame:
        ids = group[id_col].sort_values()
        return pd.DataFrame(
            {
                key_col: group[key_col].iloc[0],
                id_col: ids,
                "cluster_rep": ids.iloc[0],
                "cluster_size": len(ids),
            }
        )

    return as_arrow(ds.groupby(key_col).map_groups(collect, batch_format="pandas"))


def grouped_mode(ds, key_col: str, value_col: str):
    """A6/O3: most frequent value per key; ties broken by value ordering."""

    def mode(group: pd.DataFrame) -> pd.DataFrame:
        counts = (
            group.groupby(value_col).size().reset_index(name="n")
            .sort_values(["n", value_col], ascending=[False, True])
        )
        return pd.DataFrame(
            {
                key_col: [group[key_col].iloc[0]],
                value_col: [counts[value_col].iloc[0]],
                "n": [int(counts["n"].iloc[0])],
            }
        )

    return as_arrow(ds.groupby(key_col).map_groups(mode, batch_format="pandas"))


def focus_entity_org_bag(ds, block_col: str, name_col: str, org_col: str,
                         id_col: str):
    """J8 + A4: focus-entity regex self-lookup, then org-bag clustering.

    Reference semantics (``org_bag.py:18-19`` with the mode-based focus pick
    of ``uni_glue_baseline.R:26-29``): per block, the focus entity is the
    modal ``name_col`` value (ties → value ascending); its separator-
    insensitive key maps every non-word run to ``_`` and back to ``\\W+``
    in an anchored case-insensitive regex; rows whose name full-matches are
    the focus rows, clustered by ``org_col`` (A4 collect: keep_id = min id,
    n_members).
    """
    import re

    def per_block(group: pd.DataFrame) -> pd.DataFrame:
        counts = (
            group.groupby(name_col).size().reset_index(name="n")
            .sort_values(["n", name_col], ascending=[False, True])
        )
        focus = str(counts[name_col].iloc[0])
        key = re.sub(r"\W+", "_", focus.lower())
        rx = re.compile("^" + key.replace("_", r"\W+") + "$", re.IGNORECASE)
        sau = group[
            group[name_col].map(lambda s: rx.match(str(s)) is not None)
        ]
        out = (
            sau.groupby(org_col)
            .agg(keep_id=(id_col, "min"), n_members=(id_col, "size"))
            .reset_index()
        )
        out["n_members"] = out["n_members"].astype("int64")
        out.insert(0, block_col, group[block_col].iloc[0])
        return out

    return as_arrow(
        ds.groupby(block_col).map_groups(per_block, batch_format="pandas")
    )


def cap_per_key(
    ds,
    key_col: str,
    id_col: str,
    k: int,
    seed: int = 42,
    num_partitions: int = 16,
):
    """Deterministic per-key cap: keep at most ``k`` rows per key.

    The web-pipeline shape is "at most K pages per host" — without a cap a
    crawler-trap domain dominates the corpus.  Selection must not depend on
    arrival order, so members are ranked by ``md5(f"{seed}:{id}")`` (tie:
    id) — a pure function of (id, seed), making the kept set identical at
    any parallelism and reproducible by a SQL oracle (``row_number`` over
    the same md5 ordering).  One narrow (key, id) exchange; per-partition
    work is a vectorized sort + grouped head.
    """
    from dedup_ray.util.dsutil import partitioned_group_apply
    from dedup_ray.util.hashing import content_digest

    def per_part(part: pd.DataFrame) -> pd.DataFrame:
        if not len(part):
            return part[[key_col, id_col]]
        part = part.copy()
        part["__rk"] = [
            d[:16]
            for d in content_digest(
                [f"{seed}:{v}" for v in part[id_col].tolist()], algo="md5"
            )
        ]
        part = part.sort_values(["__rk", id_col], kind="mergesort")
        return part.groupby(key_col, sort=False).head(k)[[key_col, id_col]]

    # per-BATCH pre-cap: the global k smallest ranks of a key are a
    # subset of the union of per-batch k smallest, so a hot key (a
    # crawler-trap host with 10⁹ pages) ships ≤ k rows per batch into
    # the exchange instead of every page into one partition.
    precapped = ds.select_columns([key_col, id_col]).map_batches(
        per_part, batch_format="pandas"
    )
    return as_arrow(
        partitioned_group_apply(
            precapped,
            [key_col],
            per_part,
            num_partitions=num_partitions,
        )
    )


def distinct_rows(ds, cols: list[str]):
    """D1: distinct over a column subset (groupby keep-first)."""

    def first(group: pd.DataFrame) -> pd.DataFrame:
        return group[cols].head(1)

    return as_arrow(ds.groupby(cols).map_groups(first, batch_format="pandas"))


def cogroup(datasets, keys, fn, num_partitions: int = 16,
            empty_schemas: list[pa.Schema] | None = None):
    """N-ary cogroup: co-partition ``datasets[i]`` on ``keys[i]`` and call
    ``fn(t0, ..., tn) -> pa.Table`` once per partition with every row of a
    key from EVERY stream co-located — the general primitive under joins,
    set ops and mixed-source per-key aggregation (Spark's ``cogroup``;
    Ray Data has no native analog).  ONE exchange total, however many
    streams: cheaper than joining pre-aggregated streams pairwise, and
    ``fn`` sees each side separately so non-equi logic (outer semantics,
    per-side aggregates, asymmetric caps) needs no join-key surrogate.

    ``empty_schemas[i]`` substitutes a typed empty table when stream ``i``
    contributes only void (schema-less zero-row) blocks to a partition,
    so ``fn`` never special-cases column-less input.
    """
    from dedup_ray.util.exchange import hash_exchange

    if empty_schemas is not None:
        inner = fn

        def fn(*tables, _inner=inner, _schemas=empty_schemas):
            fixed = [
                s.empty_table()
                if (t.num_rows == 0 and not t.column_names) else t
                for t, s in zip(tables, _schemas)
            ]
            return _inner(*fixed)

    return hash_exchange(list(datasets), list(keys), fn, num_partitions)


def upsert_latest(base_ds, updates_ds, key_col: str, version_col: str,
                  num_partitions: int = 16):
    """MERGE-INTO / upsert: union base and update streams, keep the single
    highest-``version`` row per key (ties break toward the update stream,
    which carries the higher ``__src`` tag).  The lakehouse compaction
    primitive an incremental crawl needs: a re-fetched page replaces its
    old row, a brand-new page inserts, untouched rows pass through.

    One cogroup exchange on the key; per-partition selection is a
    vectorized lexsort + boundary scan (no per-row Python).  Neither
    stream is ever materialized whole — at 100 TB the base corpus streams
    through the exchange exactly once, which is the best any engine can
    do when the update set is not key-partitioned on the same layout.
    Schemas must match (`union-evolve` upstream handles drift).
    """

    base_schema = base_ds.schema()
    cols = list(base_schema.names)
    arrow_schema = pa.schema(
        [(n, t) for n, t in zip(base_schema.names, base_schema.types)]
    )

    def pick_latest(b: pa.Table, u: pa.Table) -> pa.Table:
        src = np.r_[np.zeros(b.num_rows, np.int8),
                    np.ones(u.num_rows, np.int8)]
        t = pa.concat_tables([b.select(cols), u.select(cols)])
        if t.num_rows == 0:
            return t
        k = t[key_col].to_numpy(zero_copy_only=False)
        v = t[version_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((src, v, k))  # ascending; last of each key wins
        ks = k[order]
        last = np.r_[ks[1:] != ks[:-1], True]
        return t.take(pa.array(order[np.flatnonzero(last)]))

    return cogroup(
        [base_ds, updates_ds], [key_col, key_col], pick_latest,
        num_partitions,
        empty_schemas=[arrow_schema, arrow_schema],
    )


def rollup_aggregate(ds, group_cols: list, value_col: str,
                     num_partitions: int = 16, round_digits: int = 4):
    """One-pass ROLLUP: sum + count for every prefix grouping set of
    ``group_cols`` — ``(a, b)``, ``(a,)`` and the grand total for
    ``ROLLUP(a, b)`` — in a SINGLE exchange instead of one shuffle per
    level.  Each batch emits partial (sum, count) rows for ALL levels at
    once (collapsed columns nulled, ``lvl`` = number of live group
    columns), so the all-to-all moves at most ``Σ_l |distinct prefix_l|``
    partial rows per batch and the final reduce is one grouped sum.

    The ``lvl`` column disambiguates rollup nulls from data nulls
    (``GROUPING()``'s job in SQL); group columns are assumed non-null —
    a data null would collapse into the parent level's row.  Empty input
    yields zero rows (SQL's ROLLUP emits one all-null grand-total row;
    deviation documented).  Sums are rounded at the emit point.
    """
    import pyarrow.compute as pc

    from dedup_ray.util.exchange import exchange_group_apply

    group_cols = list(group_cols)
    schema = ds.schema()
    def _as_pa_type(t):
        if isinstance(t, pa.DataType):
            return t
        d = np.dtype(t)  # pandas-born dataset: numpy dtype (object == str)
        return pa.string() if d == object else pa.from_numpy_dtype(d)

    types = {n: _as_pa_type(t) for n, t in zip(schema.names, schema.types)}

    def level_table(src: pa.Table, lvl: int, s, n) -> pa.Table:
        rows = len(s) if hasattr(s, "__len__") else 1
        cols, names = [], []
        for i, c in enumerate(group_cols):
            names.append(c)
            if i < lvl:
                cols.append(src[c])
            else:
                cols.append(pa.nulls(rows, types[c]))
        names += ["s", "n", "lvl"]
        cols += [pa.array(np.asarray(s, np.float64), pa.float64()),
                 pa.array(np.asarray(n, np.int64), pa.int64()),
                 pa.array(np.full(rows, lvl, np.int8), pa.int8())]
        return pa.Table.from_arrays(cols, names=names)

    def partial(batch: pa.Table) -> pa.Table:
        outs = []
        if batch.num_rows:
            for lvl in range(len(group_cols), 0, -1):
                g = batch.group_by(group_cols[:lvl]).aggregate(
                    [(value_col, "sum"), (value_col, "count")]
                )
                outs.append(level_table(
                    g, lvl,
                    g[f"{value_col}_sum"].to_numpy(zero_copy_only=False),
                    g[f"{value_col}_count"].to_numpy(zero_copy_only=False),
                ))
            tot = pc.sum(batch[value_col]).as_py() or 0.0
            outs.append(level_table(batch, 0, [tot], [batch.num_rows]))
        if not outs:
            return level_table(batch, 0, [], [])
        return pa.concat_tables(outs)

    out_schema = pa.schema(
        [(c, types[c]) for c in group_cols]
        + [("sum_value", pa.float64()), ("n", pa.int64()),
           ("lvl", pa.int64())]
    )

    def reduce_part(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return out_schema.empty_table()
        g = part.group_by(["lvl"] + group_cols).aggregate(
            [("s", "sum"), ("n", "sum")]
        )
        return pa.Table.from_arrays(
            [g[c] for c in group_cols]
            + [pc.round(g["s_sum"], ndigits=round_digits),
               pc.cast(g["n_sum"], pa.int64()),
               pc.cast(g["lvl"], pa.int64())],
            names=group_cols + ["sum_value", "n", "lvl"],
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return exchange_group_apply(
        partials, ["lvl"] + group_cols, reduce_part, num_partitions,
        empty_schema=pa.schema(
            [(c, types[c]) for c in group_cols]
            + [("s", pa.float64()), ("n", pa.int64()), ("lvl", pa.int8())]
        ),
    )


def cube_aggregate(ds, group_cols: list, value_col: str,
                   num_partitions: int = 16, round_digits: int = 4):
    """One-pass CUBE: sum + count for ALL ``2^k`` grouping sets of
    ``group_cols`` in a SINGLE exchange — the full-lattice counterpart
    of :func:`rollup_aggregate` (which only emits prefix sets).  Each
    batch emits partial (sum, count) rows for every subset at once;
    the all-to-all moves ``Σ_S |distinct proj_S|`` partial rows per
    batch and the final reduce is one grouped sum per partition.

    ``gset`` is the SQL ``GROUPING()`` bitmask (bit ``k-1-i`` set ⇔
    column ``i`` is collapsed/aggregated), so
    ``grouping(a)*2 + grouping(b)`` in the oracle reproduces it for
    ``CUBE(a, b)``.  Group columns are assumed non-null (a data null
    would collapse into an aggregated cell); ``k`` is capped at 4 —
    beyond that the lattice (16 sets) stops being a sane single pass.
    Empty input yields zero rows (SQL emits one all-null grand-total
    row; deviation shared with ``rollup_aggregate`` and documented).
    """
    import pyarrow.compute as pc

    from dedup_ray.util.exchange import exchange_group_apply

    group_cols = list(group_cols)
    k = len(group_cols)
    if k > 4:
        raise ValueError(f"cube over {k} columns = {2**k} grouping sets; "
                         "cap is 4 (16 sets)")
    schema = ds.schema()

    def _as_pa_type(t):
        if isinstance(t, pa.DataType):
            return t
        d = np.dtype(t)
        return pa.string() if d == object else pa.from_numpy_dtype(d)

    types = {n: _as_pa_type(t) for n, t in zip(schema.names, schema.types)}

    def mask_table(src: pa.Table, mask: int, live: list, s, n) -> pa.Table:
        rows = len(s) if hasattr(s, "__len__") else 1
        cols, names = [], []
        for i, c in enumerate(group_cols):
            names.append(c)
            if c in live:
                cols.append(src[c])
            else:
                cols.append(pa.nulls(rows, types[c]))
        names += ["s", "n", "gset"]
        cols += [pa.array(np.asarray(s, np.float64), pa.float64()),
                 pa.array(np.asarray(n, np.int64), pa.int64()),
                 pa.array(np.full(rows, mask, np.int8), pa.int8())]
        return pa.Table.from_arrays(cols, names=names)

    def partial(batch: pa.Table) -> pa.Table:
        outs = []
        if batch.num_rows:
            for mask in range(2 ** k):
                live = [c for i, c in enumerate(group_cols)
                        if not (mask >> (k - 1 - i)) & 1]
                if live:
                    g = batch.group_by(live).aggregate(
                        [(value_col, "sum"), (value_col, "count")]
                    )
                    outs.append(mask_table(
                        g, mask, live,
                        g[f"{value_col}_sum"].to_numpy(zero_copy_only=False),
                        g[f"{value_col}_count"].to_numpy(
                            zero_copy_only=False),
                    ))
                else:
                    tot = pc.sum(batch[value_col]).as_py() or 0.0
                    outs.append(mask_table(batch, mask, [], [tot],
                                           [batch.num_rows]))
        if not outs:
            return mask_table(batch, 0, group_cols, [], [])
        return pa.concat_tables(outs)

    out_schema = pa.schema(
        [(c, types[c]) for c in group_cols]
        + [("sum_value", pa.float64()), ("n", pa.int64()),
           ("gset", pa.int64())]
    )

    def reduce_part(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return out_schema.empty_table()
        g = part.group_by(["gset"] + group_cols).aggregate(
            [("s", "sum"), ("n", "sum")]
        )
        return pa.Table.from_arrays(
            [g[c] for c in group_cols]
            + [pc.round(g["s_sum"], ndigits=round_digits),
               pc.cast(g["n_sum"], pa.int64()),
               pc.cast(g["gset"], pa.int64())],
            names=group_cols + ["sum_value", "n", "gset"],
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return exchange_group_apply(
        partials, ["gset"] + group_cols, reduce_part, num_partitions,
        empty_schema=pa.schema(
            [(c, types[c]) for c in group_cols]
            + [("s", pa.float64()), ("n", pa.int64()),
               ("gset", pa.int8())]
        ),
    )


def melt_columns(ds, id_cols: list, value_cols: list,
                 var_name: str = "metric", value_name: str = "val",
                 round_digits: int = 6):
    """Unpivot / melt: widen-to-long reshape turning ``k`` value columns
    into ``k`` rows of ``(id_cols…, metric, val)`` — SQL's ``UNPIVOT``.
    Pure per-batch restructuring: ZERO exchanges, output rows =
    ``k × input rows``, values cast to float64 (the common type SQL's
    UNPIVOT also requires) and rounded at the emit point so both
    engines compare exactly.  Nulls in a value column are kept as null
    ``val`` rows (DuckDB's ``INCLUDE NULLS``-free UNPIVOT drops them;
    the catalog oracle casts before unpivoting so both sides agree on
    the kept set — callers matching plain SQL UNPIVOT should
    ``filter`` nulls downstream)."""
    import pyarrow.compute as pc

    id_cols, value_cols = list(id_cols), list(value_cols)

    def reshape(batch: pa.Table) -> pa.Table:
        outs = []
        for vc in value_cols:
            vals = pc.round(pc.cast(batch[vc], pa.float64()),
                            ndigits=round_digits)
            outs.append(pa.Table.from_arrays(
                [batch[c] for c in id_cols]
                + [pa.array(np.full(batch.num_rows, vc, object),
                            pa.string()), vals],
                names=id_cols + [var_name, value_name],
            ))
        return pa.concat_tables(outs) if outs else pa.table({})

    return ds.map_batches(reshape, batch_format="pyarrow")


def grouped_linreg(ds, group_col: str, x_col: str, y_col: str,
                   num_partitions: int = 16, round_digits: int = 6):
    """Per-group ordinary least squares from distributed sufficient
    statistics: each batch emits one (n, Σx, Σy, Σxx, Σyy, Σxy) partial
    row per group, one exchange sums them, and slope / intercept / R²
    come from the closed form — the grouped trend screen (quality drift
    per host, value-vs-time per user) with NO per-group data
    materialization; the moving state is six floats per (group, batch).

    Degenerate groups mirror SQL's ``regr_slope``: zero x-variance or
    n < 2 → NULL slope/intercept; zero y-variance additionally NULLs R².
    Output: ``(group_col, n, slope, intercept, r2)``, floats rounded at
    the emit point.
    """
    import pyarrow.compute as pc

    from dedup_ray.util.exchange import exchange_group_apply

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                group_col: pa.array([], batch[group_col].type
                                    if group_col in batch.column_names
                                    else pa.string()),
                "n": pa.array([], pa.int64()),
                **{c: pa.array([], pa.float64())
                   for c in ("sx", "sy", "sxx", "syy", "sxy")},
            })
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        t = pa.table({
            group_col: batch[group_col],
            "one": pa.array(np.ones(len(x), np.int64)),
            "sx": pa.array(x), "sy": pa.array(y),
            "sxx": pa.array(x * x), "syy": pa.array(y * y),
            "sxy": pa.array(x * y),
        })
        g = t.group_by(group_col).aggregate(
            [("one", "sum")] + [(c, "sum")
                                for c in ("sx", "sy", "sxx", "syy", "sxy")]
        )
        return g.rename_columns(
            [group_col, "n", "sx", "sy", "sxx", "syy", "sxy"])

    def final(part: pa.Table) -> pa.Table:
        if part.num_rows == 0 or group_col not in part.column_names:
            return pa.table({
                group_col: pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "slope": pa.array([], pa.float64()),
                "intercept": pa.array([], pa.float64()),
                "r2": pa.array([], pa.float64()),
            })
        g = part.group_by(group_col).aggregate(
            [("n", "sum")] + [(c, "sum")
                              for c in ("sx", "sy", "sxx", "syy", "sxy")]
        ).rename_columns([group_col, "n", "sx", "sy", "sxx", "syy", "sxy"])
        n = g["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        sx = g["sx"].to_numpy(zero_copy_only=False)
        sy = g["sy"].to_numpy(zero_copy_only=False)
        sxx = g["sxx"].to_numpy(zero_copy_only=False)
        syy = g["syy"].to_numpy(zero_copy_only=False)
        sxy = g["sxy"].to_numpy(zero_copy_only=False)
        dx = n * sxx - sx * sx
        dy = n * syy - sy * sy
        cov = n * sxy - sx * sy
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = np.where(dx > 0, cov / dx, np.nan)
            intercept = np.where(dx > 0, (sy - slope * sx) / n, np.nan)
            r2 = np.where((dx > 0) & (dy > 0), (cov * cov) / (dx * dy),
                          np.nan)
        rd = round_digits

        def col(v):
            return pa.array(np.round(v, rd), pa.float64(), from_pandas=True)

        return pa.table({
            group_col: g[group_col],
            "n": pc.cast(g["n"], pa.int64()),
            "slope": col(slope), "intercept": col(intercept),
            "r2": col(r2),
        })

    return exchange_group_apply(
        ds.map_batches(partial, batch_format="pyarrow"),
        group_col, final, num_partitions)


def grouped_mad(ds, group_col: str, value_col: str, k: float = 3.0,
                num_partitions: int = 16, round_digits: int = 6):
    """Robust per-group outlier census via the median absolute deviation:
    median, MAD = median(|v − median|), and the count of rows whose
    deviation exceeds ``k·MAD`` — the classic distribution-free outlier
    screen (e.g. flagging pathological document-length or fetch-latency
    groups where a mean/σ z-score is itself dragged by the outliers).

    Same single-exchange histogram machinery as :func:`grouped_median`:
    per-batch ``(group, value, count)`` partials, ONE exchange keyed on
    the group, then each group's median, deviation histogram, MAD and
    outlier count are all read off the bounded histogram — moving state
    scales with DISTINCT (group, value) pairs, never rows, and the raw
    column crosses the wire once.  Output:
    ``(group_col, n, median, mad, n_outliers)``.
    """
    import pyarrow.compute as pc  # noqa: F401  (parity with siblings)

    from dedup_ray.util.exchange import exchange_group_apply

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({group_col: batch[group_col],
                      "v": batch[value_col],
                      "one": pa.array(np.ones(batch.num_rows, np.int64))})
        g = t.group_by([group_col, "v"]).aggregate([("one", "sum")])
        return g.rename_columns([group_col, "v", "c"])

    def _wmedian(vals: np.ndarray, cnt: np.ndarray) -> float:
        """Weighted median of a SORTED value histogram (SQL semantics:
        even n averages the two middle order statistics)."""
        cs = np.cumsum(cnt)
        n = int(cs[-1])
        lo = int(np.searchsorted(cs, (n + 1) // 2))
        hi = int(np.searchsorted(cs, n // 2 + 1))
        return float(vals[lo]) if n % 2 else (vals[lo] + vals[hi]) / 2.0

    def final(part: pa.Table) -> pa.Table:
        empty = pa.table({
            group_col: pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "median": pa.array([], pa.float64()),
            "mad": pa.array([], pa.float64()),
            "n_outliers": pa.array([], pa.int64()),
        })
        if part.num_rows == 0 or group_col not in part.column_names:
            return empty
        g = part.group_by([group_col, "v"]).aggregate([("c", "sum")])
        df = g.to_pandas().sort_values([group_col, "v"], kind="stable")
        keys = df[group_col].to_numpy()
        v = df["v"].to_numpy(dtype=np.float64)
        c = df["c_sum"].to_numpy(dtype=np.int64)
        new = np.r_[True, keys[1:] != keys[:-1]]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(keys)]
        out_k, out_n, out_m, out_d, out_o = [], [], [], [], []
        for s, e in zip(starts, ends):
            med = _wmedian(v[s:e], c[s:e])
            dev = np.abs(v[s:e] - med)
            order = np.argsort(dev, kind="stable")
            mad = _wmedian(dev[order], c[s:e][order])
            out_k.append(keys[s])
            out_n.append(int(c[s:e].sum()))
            out_m.append(med)
            out_d.append(mad)
            out_o.append(int(c[s:e][dev > k * mad].sum()))
        return pa.table({
            group_col: pa.array(out_k, g[group_col].type),
            "n": pa.array(out_n, pa.int64()),
            "median": pa.array(np.round(out_m, round_digits), pa.float64()),
            "mad": pa.array(np.round(out_d, round_digits), pa.float64()),
            "n_outliers": pa.array(out_o, pa.int64()),
        })

    return exchange_group_apply(
        ds.map_batches(partial, batch_format="pyarrow"),
        group_col, final, num_partitions)


def recency_decay_scores(ds, group_col: str, ts_col: str,
                         tau_days: float = 7.0,
                         num_partitions: int = 16,
                         round_digits: int = 6):
    """Exponential time-decay activity score per group: each row
    contributes ``exp(−Δdays/τ)`` where Δ is its age relative to the
    corpus-wide newest timestamp, so a group's score is a recency-
    weighted event count (the standard decayed-counter freshness
    feature for crawl scheduling / user-activity ranking).

    Two passes, zero wide shuffles on raw rows: pass 1 is Ray Data's
    streaming global ``max`` over the timestamp column (one scalar on
    the driver); pass 2 maps each batch to its per-group
    ``(n, Σw)`` partial BEFORE the single group-keyed exchange, so the
    all-to-all moves one row per (block, group), never per event.
    Output: ``(group_col, n, recency)``.
    """
    from dedup_ray.util.exchange import exchange_group_apply

    ref = ds.max(ts_col)
    ref_us = int(np.datetime64(ref, "us").astype(np.int64))
    tau = float(tau_days)

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].to_numpy(zero_copy_only=False)
        ts_us = ts.astype("datetime64[us]").astype(np.int64)
        days = (ref_us - ts_us) / 86400e6
        w = np.exp(-(days / tau))
        t = pa.table({group_col: batch[group_col],
                      "w": pa.array(w, pa.float64()),
                      "one": pa.array(np.ones(batch.num_rows, np.int64))})
        g = t.group_by([group_col]).aggregate([("one", "sum"), ("w", "sum")])
        return g.rename_columns([group_col, "n", "w"])

    def final(part: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if part.num_rows == 0 or group_col not in part.column_names:
            return pa.table({
                group_col: pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "recency": pa.array([], pa.float64()),
            })
        g = part.group_by([group_col]).aggregate([("n", "sum"), ("w", "sum")])
        return pa.table({
            group_col: g[group_col],
            "n": pc.cast(g["n_sum"], pa.int64()),
            "recency": pa.array(
                np.round(g["w_sum"].to_numpy(zero_copy_only=False),
                         round_digits), pa.float64()),
        })

    return exchange_group_apply(
        ds.map_batches(partial, batch_format="pyarrow"),
        group_col, final, num_partitions)


def interarrival_stats(ds, group_col: str, ts_col: str,
                       num_partitions: int = 16, round_digits: int = 6):
    """Per-group inter-arrival-time profile: gap count, mean gap,
    coefficient of variation, and the Goh–Barabási burstiness index
    ``B = (σ−μ)/(σ+μ)`` (−1 = periodic, 0 = Poisson, →1 = bursty) —
    the standard screen for bot traffic / crawl-trap request patterns
    vs organic user activity.

    ONE exchange keyed on the group; each partition sorts only its own
    groups' timestamps (a group never spans partitions), diffs, and
    reduces to four scalars per group — so the all-to-all moves the
    two input columns once and nothing is ever collected on the
    driver.  Groups with fewer than two events carry no gap and are
    dropped.  Output: ``(group_col, n_gaps, mean_gap_s, cv,
    burstiness)``.
    """
    from dedup_ray.util.exchange import exchange_group_apply

    def profile(part: pa.Table) -> pa.Table:
        empty = pa.table({
            group_col: pa.array([], pa.int64()),
            "n_gaps": pa.array([], pa.int64()),
            "mean_gap_s": pa.array([], pa.float64()),
            "cv": pa.array([], pa.float64()),
            "burstiness": pa.array([], pa.float64()),
        })
        if part.num_rows == 0 or group_col not in part.column_names:
            return empty
        df = part.select([group_col, ts_col]).to_pandas()
        df = df.sort_values([group_col, ts_col], kind="stable")
        keys = df[group_col].to_numpy()
        ts_us = df[ts_col].to_numpy().astype("datetime64[us]").astype(
            np.int64)
        out_k, out_n, out_m, out_c, out_b = [], [], [], [], []
        new = np.r_[True, keys[1:] != keys[:-1]]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(keys)]
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            gaps = np.diff(ts_us[s:e]) / 1e6
            mu = float(gaps.mean())
            sd = float(gaps.std())  # population σ, stddev_pop semantics
            out_k.append(keys[s])
            out_n.append(len(gaps))
            out_m.append(mu)
            out_c.append(sd / mu if mu else np.nan)
            out_b.append((sd - mu) / (sd + mu) if sd + mu else np.nan)
        return pa.table({
            group_col: pa.array(out_k, part[group_col].type),
            "n_gaps": pa.array(out_n, pa.int64()),
            "mean_gap_s": pa.array(np.round(out_m, round_digits),
                                   pa.float64()),
            "cv": pa.array(np.round(out_c, round_digits), pa.float64()),
            "burstiness": pa.array(np.round(out_b, round_digits),
                                   pa.float64()),
        })

    return exchange_group_apply(ds, group_col, profile, num_partitions)


def grouped_median(ds, group_col: str, value_col: str,
                   num_partitions: int = 16, round_digits: int = 6):
    """Exact per-group median without sorting the data: per-batch
    ``(group, value, count)`` histogram partials, ONE exchange keyed on
    the group, then each group's median read off its sorted value
    histogram (even n averages the two middle values, SQL ``median``
    semantics).  Moving state is bounded by DISTINCT (group, value)
    pairs, not rows — the same histogram trick as the exact quantile
    operator; for unbounded-cardinality value columns the DDSketch path
    (``stages/sketch.py``) is the documented approximation.
    Output: ``(group_col, n, median)``.
    """
    import pyarrow.compute as pc

    from dedup_ray.util.exchange import exchange_group_apply

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({group_col: batch[group_col],
                      "v": batch[value_col],
                      "one": pa.array(np.ones(batch.num_rows, np.int64))})
        g = t.group_by([group_col, "v"]).aggregate([("one", "sum")])
        return g.rename_columns([group_col, "v", "c"])

    def final(part: pa.Table) -> pa.Table:
        if part.num_rows == 0 or group_col not in part.column_names:
            return pa.table({
                group_col: pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "median": pa.array([], pa.float64()),
            })
        g = part.group_by([group_col, "v"]).aggregate([("c", "sum")])
        df = g.to_pandas().sort_values([group_col, "v"], kind="stable")
        keys = df[group_col].to_numpy()
        v = df["v"].to_numpy(dtype=np.float64)
        c = df["c_sum"].to_numpy(dtype=np.int64)
        new = np.r_[True, keys[1:] != keys[:-1]]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(keys)]
        out_k, out_n, out_m = [], [], []
        for s, e in zip(starts, ends):
            cs = np.cumsum(c[s:e])
            n = int(cs[-1])
            lo = int(np.searchsorted(cs, (n + 1) // 2))
            hi = int(np.searchsorted(cs, n // 2 + 1))
            med = v[s + lo] if n % 2 else (v[s + lo] + v[s + hi]) / 2.0
            out_k.append(keys[s])
            out_n.append(n)
            out_m.append(med)
        return pa.table({
            group_col: pa.array(out_k, g[group_col].type),
            "n": pa.array(out_n, pa.int64()),
            "median": pa.array(np.round(out_m, round_digits),
                               pa.float64()),
        })

    return exchange_group_apply(
        ds.map_batches(partial, batch_format="pyarrow"),
        group_col, final, num_partitions)


def group_zscore(ds, group_col: str, value_col: str, id_col: str,
                 round_digits: int = 6):
    """Per-group z-score standardization ``(v − μ_g) / σ_g`` — the other
    per-bucket normalization next to the ECDF rank (``ordering.py::
    group_percent_rank``): puts per-language quality scores on one scale
    before a global threshold, preserving distance information the rank
    discards.

    Two passes, NO shuffle of the data: pass 1 reduces per-batch
    ``(group, n, Σv, Σv²)`` partials to the driver (state = K groups);
    pass 2 broadcasts the K means/stddevs and maps.  Zero-variance or
    singleton groups emit null z (SQL semantics).  Population σ (matches
    ``stddev_pop``); rounded at the emit point.
    """
    import ray

    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({group_col: pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64()),
                             "s2": pa.array([], pa.float64())})
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        g = pa.table({group_col: t[group_col],
                      "n": pa.array(np.ones(len(v), np.int64)),
                      "s": pa.array(v), "s2": pa.array(v * v)})
        out = g.group_by(group_col).aggregate(
            [("n", "sum"), ("s", "sum"), ("s2", "sum")])
        return out.rename_columns([group_col, "n", "s", "s2"])

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    stats = {}
    if len(parts):
        agg = parts.groupby(group_col).sum()
        for k, row in agg.iterrows():
            mu = row["s"] / row["n"]
            var = max(row["s2"] / row["n"] - mu * mu, 0.0)
            stats[k] = (mu, np.sqrt(var))
    ref = ray.put(stats)

    def apply(t: pa.Table) -> pa.Table:
        st = ray.get(ref) if not isinstance(ref, dict) else ref
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        groups = t[group_col].to_pylist()
        mu = np.array([st.get(g, (np.nan, 0.0))[0] for g in groups])
        sd = np.array([st.get(g, (np.nan, 0.0))[1] for g in groups])
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.where(sd > 0, (v - mu) / sd, np.nan)
        return pa.table({
            id_col: t[id_col], group_col: t[group_col],
            value_col: t[value_col],
            "z": pa.array(np.round(z, round_digits), pa.float64(),
                          from_pandas=True),
        })

    return ds.map_batches(apply, batch_format="pyarrow")


def grouped_rolling(ds, key_col: str, order_cols: list[str],
                    value_col: str, window: int = 4,
                    num_partitions: int = 16, round_digits: int = 6):
    """Per-key ROWS-frame sliding aggregates: for every row, the mean /
    sum of ``value_col`` over the last ``window`` rows of its key's
    stream (frame ``ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW``),
    plus ``delta`` vs the previous row (lag diff; null at each key's
    first row).

    The moving-statistics primitive of monitoring / feature pipelines
    (rate smoothing, burst detection, per-user trend features).  ONE
    hash exchange on the key — each key's history lands whole in one
    partition — then a single vectorized pandas pass over ALL keys in
    the partition (sort + cython ``groupby.rolling``): per-key dispatch
    would be ruinous at web user cardinality.  Window state is O(window)
    per key and never crosses partitions, so the operator streams at any
    corpus size.  Ordering stated: ``order_cols`` must end in a tiebreak
    unique within key for deterministic output.
    """
    import pandas as pd

    from dedup_ray.util.dsutil import partitioned_group_apply

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, *order_cols])
        g = df.groupby(key_col, sort=False)[value_col]
        roll = g.rolling(window=window, min_periods=1)
        df = df.assign(
            roll_avg=np.round(roll.mean().to_numpy(), round_digits),
            roll_sum=np.round(roll.sum().to_numpy(), round_digits),
            delta=np.round(df[value_col] - g.shift(1), round_digits),
        )
        return df.drop(columns=[value_col])

    return partitioned_group_apply(ds, [key_col], per_part,
                                   num_partitions=num_partitions)


def cohort_retention(ds, user_col: str, ts_col: str,
                     num_partitions: int = 16):
    """Weekly cohort-retention matrix: (cohort_week, age_weeks, n_users).

    Each user joins the cohort of their first active ISO week; the
    matrix counts, per cohort and week-offset, how many of its users
    were active that week — the standard engagement/retention rollup
    over an event log (here: crawl/user activity).

    Weeks are integer indexes (weeks since Monday 1970-01-05) so the
    Arrow kernel and the SQL oracle compare on exact int64 arithmetic —
    no date-truncation or timezone semantics in the equality test.

    ONE user-keyed hash exchange: every user's history lands whole in
    one partition, where a vectorized pandas pass computes first-week
    cohorts and distinct active weeks for ALL users at once and emits
    per-partition partial counts; a second single-partition exchange
    sums the partials — its input is bounded by partitions × cohorts ×
    ages, never by users or events.
    """
    import pandas as pd

    from dedup_ray.util.dsutil import partitioned_group_apply

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        days = df[ts_col].to_numpy().astype("datetime64[D]").astype(np.int64)
        df = df.assign(week=(days - 4) // 7)  # 1970-01-05 was a Monday
        uw = df[[user_col, "week"]].drop_duplicates()
        cohort = uw.groupby(user_col, sort=False)["week"].transform("min")
        uw = uw.assign(cohort_week=cohort,
                       age_weeks=uw["week"] - cohort)
        out = (uw.groupby(["cohort_week", "age_weeks"], sort=False)
               .size().rename("n_users").reset_index())
        return out

    partial = partitioned_group_apply(
        ds, [user_col], per_part, num_partitions=num_partitions)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["cohort_week", "age_weeks"], sort=False)
               ["n_users"].sum().reset_index())
        out["n_users"] = out["n_users"].astype("int64")
        return out

    return partitioned_group_apply(partial, ["cohort_week"], combine,
                                   num_partitions=1)


def cooccurrence(ds, key_col: str, value_col: str,
                 num_partitions: int = 16, max_values: int | None = None):
    """Unordered co-occurrence counts: for every pair of ``value_col``
    values that share at least one ``key_col`` key, the number of
    distinct keys where both occur.

    The curation cross-tab behind "which sources syndicate the same
    pages" (key=digest, value=source) or "which tokens co-occur in
    documents" (key=doc, value=token).  One key-keyed exchange — all
    rows of a key land whole in one partition, where a vectorized
    self-merge emits each key's C(k, 2) pairs — then a bounded
    partial-sum combine (output rows ≤ distinct-value pairs, never
    keys).  A key shared by k values costs C(k, 2) pair rows: that is
    the operator's skew bound; ``max_values`` (optional, documented
    approximation) keeps only each key's smallest values, the same
    policy as the LSH hot-bucket and triangle degree caps.
    """
    import pandas as pd

    from dedup_ray.util.dsutil import partitioned_group_apply

    v1, v2 = value_col + "_1", value_col + "_2"

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[key_col, value_col]].drop_duplicates()
        if max_values is not None:
            df = df.sort_values([key_col, value_col]) \
                .groupby(key_col, sort=False).head(max_values)
        m = df.merge(df, on=key_col)
        xa, xb = value_col + "_x", value_col + "_y"
        m = m[m[xa] < m[xb]]
        return (m.groupby([xa, xb]).size().rename("n_keys").reset_index()
                .rename(columns={xa: v1, xb: v2}))

    partial = partitioned_group_apply(ds, [key_col], per_part,
                                      num_partitions=num_partitions)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby([v1, v2])["n_keys"].sum().reset_index()
        out["n_keys"] = out["n_keys"].astype("int64")
        return out

    return partitioned_group_apply(partial, [v1, v2], combine,
                                   num_partitions=max(1,
                                                      num_partitions // 4))


def funnel_steps(ds, user_col: str, ts_col: str, type_col: str,
                 steps: list[str], window_us: int | None = None,
                 num_partitions: int = 16):
    """Windowed funnel progression: how far each user advances through
    ``steps`` — the first step takes the user's earliest such event;
    every later step needs an event of its type STRICTLY LATER than the
    previous step's completion and (if ``window_us`` is set) within
    ``window_us`` microseconds of it.  Output: ``(steps_completed,
    n_users)`` — the conversion rollup every event pipeline reports.

    ONE user-keyed hash exchange lands each user's history whole in one
    partition; inside, the chain is vectorized ACROSS users — per step a
    masked grouped min over int64 microseconds, ``len(steps)`` bounded
    passes, never a per-user Python loop.  The combine input is bounded
    by partitions × (len(steps)+1) rows.  Strict ``>`` / ``<=`` on
    integer microseconds keeps tie semantics engine-independent (the
    float sentinel math stays exact: epoch-micros < 2⁵³).
    """
    from dedup_ray.util.dsutil import partitioned_group_apply

    win = np.float64(window_us) if window_us is not None else np.inf

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        df = pd.DataFrame({"u": df[user_col].to_numpy(),
                           "t": ts, "k": df[type_col].to_numpy()})
        users = df["u"].drop_duplicates()
        # prev[u] = completion time of the previous step; +inf = blocked
        prev = pd.Series(np.nan, index=users)
        done = pd.Series(0, index=users, dtype="int64")
        for i, step in enumerate(steps):
            ev = df[df["k"] == step]
            if i > 0:
                p = prev.reindex(ev["u"]).to_numpy()
                ev = ev[(ev["t"].to_numpy() > p)
                        & (ev["t"].to_numpy() <= p + win)]
            t_step = ev.groupby("u")["t"].min()
            done.loc[t_step.index] += 1
            prev = t_step.reindex(users.to_numpy()).fillna(np.inf)
        vc = done.value_counts()
        return pd.DataFrame({
            "steps_completed": vc.index.to_numpy().astype("int64"),
            "n_users": vc.to_numpy().astype("int64"),
        })

    partial = partitioned_group_apply(
        ds, [user_col], per_part, num_partitions=num_partitions)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("steps_completed")["n_users"].sum().reset_index()
        out["n_users"] = out["n_users"].astype("int64")
        return out

    return partitioned_group_apply(partial, ["steps_completed"], combine,
                                   num_partitions=1)


def event_transitions(ds, user_col: str, ts_col: str, type_col: str,
                      id_col: str, num_partitions: int = 16):
    """First-order Markov transition counts over each user's event
    sequence: ``(prev_type, next_type, n)`` summed across users — the
    session-flow / navigation matrix.

    ONE user-keyed exchange; per partition, a vectorized sort by
    ``(user, ts, id)`` + a shifted-column compare produces every
    consecutive pair for ALL users at once (the id column breaks
    timestamp ties deterministically, so both engines see the same
    sequence).  The combine input is bounded by partitions × types².
    """
    from dedup_ray.util.dsutil import partitioned_group_apply

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([user_col, ts_col, id_col], kind="mergesort")
        same = df[user_col].to_numpy()[1:] == df[user_col].to_numpy()[:-1]
        k = df[type_col].to_numpy()
        pairs = pd.DataFrame({"prev_type": k[:-1][same],
                              "next_type": k[1:][same]})
        return (pairs.groupby(["prev_type", "next_type"]).size()
                .rename("n").reset_index())

    partial = partitioned_group_apply(
        ds, [user_col], per_part, num_partitions=num_partitions)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["prev_type", "next_type"])["n"].sum().reset_index()
        out["n"] = out["n"].astype("int64")
        return out

    return partitioned_group_apply(partial, ["prev_type"], combine,
                                   num_partitions=1)


def interval_overlap_join(ds, id_col: str, start_col: str, end_col: str,
                          tile_us: int, num_partitions: int = 16):
    """Self-join of half-open intervals ``[s, e)`` on OVERLAP — the
    interval analog of the as-of/range joins (which look up points in
    windows; this pairs windows with windows: concurrent sessions,
    overlapping crawls, clashing locks).

    Ray Data has no interval join; equality machinery can't express
    ``s1 < e2 AND s2 < e1``.  The distributed shape is TILING: time is
    cut into fixed ``tile_us`` tiles, each interval is replicated to
    every tile it touches (replication factor = interval length /
    tile_us + 1 — pick the tile about as long as a typical interval),
    one exchange co-locates tiles, and an in-tile Acero self-join finds
    pairs.  A pair overlapping several tiles would duplicate, so each
    pair is claimed EXACTLY ONCE, by the tile containing the LATER start
    (that tile always witnesses the overlap: ``max(s1,s2) <
    min(e1,e2)`` lies in it).  No global dedup pass needed.

    Output: ``(id1, id2, overlap_us)`` with ``id1 < id2`` and the exact
    integer overlap length — nothing float crosses engines.
    """
    from dedup_ray.util.exchange import exchange_group_apply

    def tiles(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        s = t[start_col].to_numpy(zero_copy_only=False).astype(np.int64)
        e = t[end_col].to_numpy(zero_copy_only=False).astype(np.int64)
        t0 = s // tile_us
        t1 = (e - 1) // tile_us  # half-open: e is exclusive
        cnt = (t1 - t0 + 1).astype(np.int64)
        rep = np.repeat(np.arange(len(ids)), cnt)
        # per-interval running tile index
        firsts = np.r_[0, np.cumsum(cnt)[:-1]]
        off = np.arange(cnt.sum()) - firsts[rep]
        return pa.table({
            "tile": pa.array(t0[rep] + off, pa.int64()),
            id_col: pa.array(ids[rep], pa.int64()),
            "s": pa.array(s[rep], pa.int64()),
            "e": pa.array(e[rep], pa.int64()),
        })

    rows = ds.map_batches(tiles, batch_format="pyarrow")

    def join_tile(part: pa.Table) -> pa.Table:
        empty = pa.table({"id1": pa.array([], pa.int64()),
                          "id2": pa.array([], pa.int64()),
                          "overlap_us": pa.array([], pa.int64())})
        if part.num_rows == 0 or "tile" not in part.column_names:
            return empty
        lf = part.rename_columns(["tile", "id1", "s1", "e1"])
        rf = part.rename_columns(["tile", "id2", "s2", "e2"])
        j = lf.join(rf, keys="tile", join_type="inner")
        id1 = j["id1"].to_numpy(zero_copy_only=False)
        id2 = j["id2"].to_numpy(zero_copy_only=False)
        s1 = j["s1"].to_numpy(zero_copy_only=False)
        s2 = j["s2"].to_numpy(zero_copy_only=False)
        e1 = j["e1"].to_numpy(zero_copy_only=False)
        e2 = j["e2"].to_numpy(zero_copy_only=False)
        tile = j["tile"].to_numpy(zero_copy_only=False)
        smax = np.maximum(s1, s2)
        keep = ((id1 < id2) & (s1 < e2) & (s2 < e1)
                & (smax // tile_us == tile))   # claimed once
        return pa.table({
            "id1": pa.array(id1[keep]),
            "id2": pa.array(id2[keep]),
            "overlap_us": pa.array(
                np.minimum(e1, e2)[keep] - smax[keep]),
        })

    return exchange_group_apply(rows, "tile", join_tile, num_partitions)


def grouped_trimmed_mean(ds, group_col: str, value_col: str,
                         trim: float = 0.1, num_partitions: int = 16):
    """Exact per-group trimmed mean without sorting rows: the
    ``grouped_median`` histogram trick — per-batch (group, value, count)
    partials, one group-keyed exchange, then each group's trim is read
    off the sorted VALUE HISTOGRAM: with ``k = floor(n·trim)`` rows cut
    from each tail, a value's kept multiplicity is
    ``clamp(min(cum, n−k) − max(cum−c, k), ≥0)`` (cum = inclusive
    cumulative count), so ties straddling a cut are split exactly the
    way a row sort would.  Moving state is bounded by distinct (group,
    value) pairs.  Output: ``(group_col, n, trimmed_mean)`` at 6 dp."""
    from dedup_ray.util.exchange import exchange_group_apply

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({group_col: batch[group_col],
                      "v": batch[value_col],
                      "one": pa.array(np.ones(batch.num_rows, np.int64))})
        g = t.group_by([group_col, "v"]).aggregate([("one", "sum")])
        return g.rename_columns([group_col, "v", "c"])

    gtype = dict(zip(ds.schema().names, ds.schema().types))[group_col]
    if not isinstance(gtype, pa.DataType):
        d = np.dtype(gtype)
        gtype = pa.string() if d == object else pa.from_numpy_dtype(d)
    out_schema = pa.schema([(group_col, gtype), ("n", pa.int64()),
                            ("trimmed_mean", pa.float64())])

    def final(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return out_schema.empty_table()
        df = part.to_pandas().groupby([group_col, "v"], sort=True) \
                 .sum().reset_index()
        gs, ns, ms = [], [], []
        for g, sub in df.groupby(group_col, sort=True):
            v = sub["v"].to_numpy(dtype=np.float64)
            c = sub["c"].to_numpy(dtype=np.int64)
            n = int(c.sum())
            k = int(np.floor(n * trim))
            if n - 2 * k <= 0:
                continue
            cum = np.cumsum(c)
            kept = np.minimum(cum, n - k) - np.maximum(cum - c, k)
            kept = np.maximum(kept, 0)
            gs.append(g)
            ns.append(n)
            ms.append(round(float((v * kept).sum()) / (n - 2 * k), 6))
        return pa.table({group_col: pa.array(gs, gtype),
                         "n": pa.array(ns, pa.int64()),
                         "trimmed_mean": pa.array(ms, pa.float64())})

    return exchange_group_apply(
        ds.select_columns([group_col, value_col])
        .map_batches(partial, batch_format="pyarrow"),
        [group_col], final, num_partitions,
        empty_schema=pa.schema([(group_col, gtype), ("v", pa.float64()),
                                ("c", pa.int64())]),
    )
