"""Distributed table profiling: per-column null counts, exact distinct
counts, and numeric min/max — the schema-discovery pass a pipeline runs
before choosing partition keys, salting policies and filter pushdowns.

Shapes (per profiled column, all narrow):

- nulls / min / max: one per-batch partial row per column, combined on
  the driver (C rows total — no shuffle);
- exact distinct count: per-batch ``np.unique`` partials then ONE grouped
  count per column, so the shuffle payload is each batch's distinct
  values, never raw rows.  This is the exact path; for columns whose
  distinct cardinality is itself corpus-sized, the HyperLogLog sketch
  (``stages/sketch.py``) is the bounded-state substitute.

Reference analog: the ad-hoc sanity screens of ``check_features.py:34-43``
/ ``dual_marry.py:14-17`` — feature-by-feature scans over whole files —
lifted to one declarative operator.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def profile_table(ds, columns: list[str]) -> pa.Table:
    """Profile ``columns`` of ``ds``.

    Returns one row per column:
    ``(column, n_rows, n_nulls, n_distinct, min_num, max_num)`` where
    ``min_num``/``max_num`` are the native min/max cast to float64 for
    numeric/temporal columns and null for strings (casting a string
    extremum to a shared output type would change its ordering
    semantics, so it is not reported).
    """
    schema = ds.schema()
    types = dict(zip(schema.names, schema.types))

    def partial(t: pa.Table) -> pa.Table:
        rows = []
        for c in columns:
            col = t[c]
            n = len(col)
            nulls = col.null_count
            is_num = pa.types.is_floating(types[c]) \
                or pa.types.is_integer(types[c]) \
                or pa.types.is_temporal(types[c])
            if is_num and n - nulls > 0:
                mn = pc.min(col).cast(pa.int64()).as_py() \
                    if pa.types.is_temporal(types[c]) \
                    else pc.min(col).as_py()
                mx = pc.max(col).cast(pa.int64()).as_py() \
                    if pa.types.is_temporal(types[c]) \
                    else pc.max(col).as_py()
            else:
                mn = mx = None
            rows.append((c, n, nulls,
                         float(mn) if mn is not None else None,
                         float(mx) if mx is not None else None))
        return pa.table({
            "col_name": pa.array([r[0] for r in rows], pa.string()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "nulls": pa.array([r[2] for r in rows], pa.int64()),
            "mn": pa.array([r[3] for r in rows], pa.float64()),
            "mx": pa.array([r[4] for r in rows], pa.float64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        import pandas as pd

        parts = pd.DataFrame({"col_name": columns,
                              "n": 0, "nulls": 0,
                              "mn": np.nan, "mx": np.nan})
    agg = parts.groupby("col_name").agg(
        n=("n", "sum"), nulls=("nulls", "sum"),
        mn=("mn", "min"), mx=("mx", "max"))

    # ALL columns' distinct counts through ONE exchange (the former
    # one-plan-plus-shuffle PER COLUMN made this the slowest catalog
    # query): per batch, each column's distinct values cast to their
    # round-trip-exact string form (Arrow float64→string is shortest
    # round-trip, so the cast is injective; −0.0 is normalized to 0.0
    # first, matching SQL DISTINCT) and stacked into one narrow
    # (col_name, val) stream; a single (col_name, val)-keyed exchange
    # then counts distinct values per column.
    from dedup_ray.util.exchange import exchange_group_apply

    def uniq_all(t: pa.Table) -> pa.Table:
        names: list = []
        vals: list = []
        for c in columns:
            col = t[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if pa.types.is_floating(col.type):
                col = pc.add(col, 0.0)  # −0.0 → 0.0
            u = pc.cast(col.drop_null().unique(), pa.string())
            names.append(pa.array([c] * len(u), pa.string()))
            vals.append(u)
        return pa.table({
            "col_name": pa.concat_arrays(names),
            "val": pa.concat_arrays(
                [v.cast(pa.string()) for v in vals]
            ) if vals else pa.array([], pa.string()),
        })

    def count_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "col_name" not in t.column_names:
            return pa.table({"col_name": pa.array([], pa.string()),
                             "k": pa.array([], pa.int64())})
        g = (
            t.group_by(["col_name", "val"]).aggregate([])
            .group_by("col_name").aggregate([("val", "count")])
        )
        return pa.table({"col_name": g["col_name"],
                         "k": g["val_count"].cast(pa.int64())})

    partials = exchange_group_apply(
        ds.map_batches(uniq_all, batch_format="pyarrow"),
        ["col_name", "val"],
        count_part,
        num_partitions=8,
        empty_schema=pa.schema(
            [("col_name", pa.string()), ("val", pa.string())]
        ),
    ).to_pandas()
    agg_d = (
        partials.groupby("col_name")["k"].sum().to_dict()
        if "col_name" in partials.columns and len(partials)
        else {}
    )
    distincts = {c: int(agg_d.get(c, 0)) for c in columns}

    return pa.table({
        "col_name": pa.array(columns, pa.string()),
        "n_rows": pa.array([int(agg.loc[c, "n"]) for c in columns],
                           pa.int64()),
        "n_nulls": pa.array([int(agg.loc[c, "nulls"]) for c in columns],
                            pa.int64()),
        "n_distinct": pa.array([int(distincts[c]) for c in columns],
                               pa.int64()),
        "min_num": pa.array([agg.loc[c, "mn"] for c in columns],
                            pa.float64()),
        "max_num": pa.array([agg.loc[c, "mx"] for c in columns],
                            pa.float64()),
    })


def profile_sql(table: str, columns: list[str],
                types: dict[str, str]) -> str:
    """Generated oracle: one UNION ALL branch per column.  ``types[c]``
    is 'num' (cast min/max to DOUBLE), 'ts' (epoch-micros DOUBLE) or
    'str' (null min/max)."""
    parts = []
    for c in columns:
        if types[c] == "num":
            mm = f"min({c})::DOUBLE, max({c})::DOUBLE"
        elif types[c] == "ts":
            mm = (f"epoch_us(min({c}))::DOUBLE, "
                  f"epoch_us(max({c}))::DOUBLE")
        else:
            mm = "NULL::DOUBLE, NULL::DOUBLE"
        parts.append(
            f"SELECT '{c}' AS col_name, count(*)::BIGINT AS n_rows, "
            f"(count(*) - count({c}))::BIGINT AS n_nulls, "
            f"count(DISTINCT {c})::BIGINT AS n_distinct, "
            f"{mm.split(', ')[0]} AS min_num, "
            f"{mm.split(', ')[1]} AS max_num FROM {table}"
        )
    return " UNION ALL ".join(parts)


def validate_rules(ds, rules: list[dict], num_partitions: int = 8):
    """Declarative data-quality gate (the "expectations" pass a corpus
    run executes before training): rules are DATA, the oracle is
    generated from the same list (:func:`validate_sql`), and the output
    is one ``(rule, n_rows, n_violations)`` row per rule.

    Rule kinds (``{"name", "kind", "column", ...}``):

    - ``not_null`` — nulls violate;
    - ``range`` (``lo``/``hi`` inclusive) — non-null values outside
      violate (nulls are ``not_null``'s job, SQL three-valued logic);
    - ``regex`` (RE2 ``pattern``, full match) — non-null non-matching
      values violate;
    - ``isin`` (``values``) — non-null values outside the set violate;
    - ``unique`` — violations = n_rows − n_distinct − n_nulls (each
      surplus copy counts once, SQL ``count(*) − count(DISTINCT c)``
      − nulls... see below; nulls never violate uniqueness).

    Scalar rules ride ONE vectorized pass (per-batch violation-count
    partials, driver combine of R×B ints); each ``unique`` rule adds
    per-batch distinct-value partials through one shared
    (rule, value)-keyed exchange — the ``profile_table`` machinery.
    """
    scalar = [r for r in rules if r["kind"] != "unique"]
    uniq = [r for r in rules if r["kind"] == "unique"]

    def partial(t: pa.Table) -> pa.Table:
        names, nrows, nviol = [], [], []
        for r in scalar:
            col = t[r["column"]]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if r["kind"] == "not_null":
                v = col.null_count
            elif r["kind"] == "range":
                bad = pc.or_(pc.less(col, r["lo"]),
                             pc.greater(col, r["hi"]))
                v = pc.sum(bad).as_py() or 0  # nulls -> null -> not counted
            elif r["kind"] == "regex":
                ok = pc.match_substring_regex(
                    col, f"^(?:{r['pattern']})$")
                v = pc.sum(pc.invert(ok)).as_py() or 0
            elif r["kind"] == "isin":
                ok = pc.is_in(col, value_set=pa.array(r["values"]))
                # is_in(null) is false, but nulls must not violate
                v = (pc.sum(pc.invert(ok)).as_py() or 0) - col.null_count
            else:
                raise ValueError(f"unknown rule kind {r['kind']!r}")
            names.append(r["name"])
            nrows.append(t.num_rows)
            nviol.append(int(v))
        return pa.table({
            "rule": pa.array(names, pa.string()),
            "n_rows": pa.array(nrows, pa.int64()),
            "n_violations": pa.array(nviol, pa.int64()),
        })

    import pandas as pd

    frames = []
    if scalar:
        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        if len(parts):
            frames.append(parts.groupby("rule", as_index=False).sum())
        else:
            frames.append(pd.DataFrame({
                "rule": [r["name"] for r in scalar],
                "n_rows": 0, "n_violations": 0}))

    if uniq:
        from dedup_ray.util.exchange import exchange_group_apply

        def uniq_partial(t: pa.Table) -> pa.Table:
            names, vals = [], []
            for r in uniq:
                col = t[r["column"]]
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                if pa.types.is_floating(col.type):
                    col = pc.add(col, 0.0)
                u = pc.cast(col.drop_null().unique(), pa.string())
                names.append(pa.array([r["name"]] * len(u), pa.string()))
                vals.append(u)
            return pa.table({
                "rule": pa.concat_arrays(names),
                "val": pa.concat_arrays(vals) if vals
                else pa.array([], pa.string()),
            })

        def totals_partial(t: pa.Table) -> pa.Table:
            rows = [(r["name"], t.num_rows, t[r["column"]].null_count)
                    for r in uniq]
            return pa.table({
                "rule": pa.array([x[0] for x in rows], pa.string()),
                "n": pa.array([x[1] for x in rows], pa.int64()),
                "nulls": pa.array([x[2] for x in rows], pa.int64()),
            })

        tot = ds.map_batches(
            totals_partial, batch_format="pyarrow").to_pandas()
        tot = tot.groupby("rule").sum() if len(tot) else None

        def count_part(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "rule" not in t.column_names:
                return pa.table({"rule": pa.array([], pa.string()),
                                 "k": pa.array([], pa.int64())})
            g = (t.group_by(["rule", "val"]).aggregate([])
                 .group_by("rule").aggregate([("val", "count")]))
            return pa.table({"rule": g["rule"],
                             "k": g["val_count"].cast(pa.int64())})

        dist = exchange_group_apply(
            ds.map_batches(uniq_partial, batch_format="pyarrow"),
            ["rule", "val"], count_part, num_partitions,
            empty_schema=pa.schema([("rule", pa.string()),
                                    ("val", pa.string())]),
        ).to_pandas()
        kmap = (dist.groupby("rule")["k"].sum().to_dict()
                if "rule" in dist.columns and len(dist) else {})
        rows = []
        for r in uniq:
            n = int(tot.loc[r["name"], "n"]) if tot is not None else 0
            nulls = int(tot.loc[r["name"], "nulls"]) if tot is not None \
                else 0
            k = int(kmap.get(r["name"], 0))
            rows.append((r["name"], n, n - nulls - k))
        frames.append(pd.DataFrame(
            rows, columns=["rule", "n_rows", "n_violations"]))

    out = pd.concat(frames, ignore_index=True)
    order = {r["name"]: i for i, r in enumerate(rules)}
    out = out.sort_values("rule", key=lambda s: s.map(order))
    return pa.table({
        "rule": pa.array(out["rule"], pa.string()),
        "n_rows": pa.array(out["n_rows"].to_numpy(np.int64)),
        "n_violations": pa.array(out["n_violations"].to_numpy(np.int64)),
    })


def validate_sql(rules: list[dict], table: str) -> str:
    """Generated oracle for :func:`validate_rules` — one UNION ALL branch
    per rule from the SAME rule list."""
    parts = []
    for r in rules:
        c = r["column"]
        if r["kind"] == "not_null":
            v = f"count(*) - count({c})"
        elif r["kind"] == "range":
            v = (f"coalesce(sum(CASE WHEN {c} < {r['lo']} OR "
                 f"{c} > {r['hi']} THEN 1 ELSE 0 END), 0)")
        elif r["kind"] == "regex":
            v = (f"coalesce(sum(CASE WHEN {c} IS NOT NULL AND NOT "
                 f"regexp_full_match({c}, '{r['pattern']}') "
                 f"THEN 1 ELSE 0 END), 0)")
        elif r["kind"] == "isin":
            lits = ", ".join("'" + str(x).replace("'", "''") + "'"
                             for x in r["values"])
            v = (f"coalesce(sum(CASE WHEN {c} IS NOT NULL AND {c} NOT IN "
                 f"({lits}) THEN 1 ELSE 0 END), 0)")
        elif r["kind"] == "unique":
            v = f"count({c}) - count(DISTINCT {c})"
        else:
            raise ValueError(f"unknown rule kind {r['kind']!r}")
        parts.append(
            f"SELECT '{r['name']}' AS rule, count(*)::BIGINT AS n_rows, "
            f"({v})::BIGINT AS n_violations FROM {table}"
        )
    return " UNION ALL ".join(parts)
