"""Distributed classical statistics: independence tests, autocorrelation,
two-sample distribution comparison, concentration indices.

The corpus-audit counterpart of `ops/evaluate.py` (which scores CLUSTERINGS):
these score the DATA — is language independent of crawl source (chi-squared /
Cramér's V), is the event stream autocorrelated (ACF), did two segments draw
from the same distribution (Kolmogorov–Smirnov), how concentrated is the
token mass (Gini / Shannon).  The reference's evaluation habit
(`pscore.R:10-14` per-block score reporting, `eval.py`-style accuracy sweeps)
extended with the standard audit statistics a crawl-curation run reports.

Scale shapes: every operator reduces the corpus to bounded state before
anything central happens — contingency cells (|A|×|B|), per-group moment
partials, per-bucket ECDF offsets, a vocab-bounded count table.  No global
sort anywhere; the KS pass is two narrow exchanges with driver state bounded
by the bucket grid, the same histogram-offset trick as
`stages/ordering.py::exact_quantiles`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def chi2_independence(ds, col_a: str, col_b: str):
    """Pearson chi-squared test of independence between two categorical
    columns, plus Cramér's V — one row ``(chi2, dof, cramers_v, n)``.

    Per-batch partial cell counts (|A|×|B|-bounded) reach ONE reduce task
    which rebuilds the FULL grid from the row/column marginals — zero-
    observed cells contribute their full expectation (chi2 += E), which a
    cells-only sum would silently drop.  Driver never sees row data.
    """
    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by([col_a, col_b]).aggregate([([], "count_all")])
        return g.rename_columns([col_a, col_b, "c"])

    cells = ds.map_batches(partial, batch_format="pyarrow")

    out_schema = pa.schema([
        ("chi2", pa.float64()), ("dof", pa.int64()),
        ("cramers_v", pa.float64()), ("n", pa.int64()),
    ])

    def reduce_fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas().groupby([col_a, col_b], sort=True)["c"].sum()
        grid = df.unstack(fill_value=0).to_numpy(dtype=np.float64)
        n = grid.sum()
        exp = np.outer(grid.sum(axis=1), grid.sum(axis=0)) / n
        chi2 = float(((grid - exp) ** 2 / exp).sum())
        r, c = grid.shape
        dof = (r - 1) * (c - 1)
        v = float(np.sqrt(chi2 / (n * (min(r, c) - 1)))) if min(r, c) > 1 else 0.0
        return pa.table({
            "chi2": pa.array([round(chi2, 6)], pa.float64()),
            "dof": pa.array([dof], pa.int64()),
            "cramers_v": pa.array([round(v, 6)], pa.float64()),
            "n": pa.array([int(n)], pa.int64()),
        })

    from dedup_ray.util.exchange import exchange_group_apply

    # single partition: input is |A|×|B| partial cells per block, tiny
    return exchange_group_apply(
        cells, [col_a], reduce_fn, num_partitions=1,
        empty_schema=pa.schema([(col_a, pa.string()), (col_b, pa.string()),
                                ("c", pa.int64())]),
    )


def acf(ds, group_col: str, ts_col: str, value_col: str,
        order_tiebreak: str, max_lag: int = 3, num_partitions: int = 8):
    """Per-group autocorrelation function at lags 1..``max_lag`` over the
    series ordered by ``(ts_col, order_tiebreak)``: one exchange keyed on
    the group, a vectorized numpy lag pass per partition.  acf_k =
    Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)² — the standard biased estimator
    (shared denominator, so acf_0 == 1 and |acf_k| ≤ 1).

    Output ``(group, lag, acf)``; groups shorter than ``lag+1`` rows emit
    no row for that lag.  Partitioning assumption: one group wholly in one
    partition (exchange invariant).
    """
    from dedup_ray.util.exchange import exchange_group_apply

    out_schema = pa.schema([
        (group_col, pa.string()), ("lag", pa.int64()), ("acf", pa.float64()),
    ])

    def per_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.select([group_col, ts_col, order_tiebreak, value_col]) \
              .to_pandas().sort_values([ts_col, order_tiebreak], kind="mergesort")
        gs, lags, vals = [], [], []
        for g, sub in df.groupby(group_col, sort=False):
            x = sub[value_col].to_numpy(dtype=np.float64)
            d = x - x.mean()
            den = float(d @ d)
            if den == 0.0:
                continue
            for k in range(1, max_lag + 1):
                if len(x) <= k:
                    break
                gs.append(g)
                lags.append(k)
                vals.append(round(float(d[:-k] @ d[k:]) / den, 6))
        return pa.table({group_col: pa.array(gs, pa.string()),
                         "lag": pa.array(lags, pa.int64()),
                         "acf": pa.array(vals, pa.float64())})

    sch = pa.schema([(group_col, pa.string()), (ts_col, pa.timestamp("us")),
                     (order_tiebreak, pa.int64()), (value_col, pa.float64())])
    return exchange_group_apply(
        ds.select_columns([group_col, ts_col, order_tiebreak, value_col]),
        [group_col], per_part, num_partitions, empty_schema=sch,
    )


def ks_two_sample(ds, label_col: str, value_col: str, label_a: str,
                  label_b: str, bucket_width: float = 0.25,
                  num_partitions: int = 8):
    """Exact two-sample Kolmogorov–Smirnov D statistic between the
    ``value_col`` distributions of two labels — WITHOUT a global sort.

    Pass 1 counts per-(range-bucket, sample) rows; the driver holds only
    the bucket grid (range/width-bounded — the documented assumption: the
    value range is bounded, as every quality-score / rate column here is)
    and prefix-sums it into per-bucket BELOW-offsets.  Pass 2 exchanges on
    the bucket: each partition sorts only its buckets' values, adds the
    broadcast offsets, and reports its local max |F1−F2| evaluated at
    distinct values (ECDF right-continuity: counts ≤ v).  The global D is
    the max of the per-partition maxima — exact, because every distinct
    value is scored in exactly one partition with globally correct
    cumulative counts.  Output: one row ``(ks_d, n1, n2)``.
    """
    import pyarrow.compute as pc

    import ray

    def bucket_of(vals: np.ndarray) -> np.ndarray:
        return np.floor(vals / bucket_width).astype(np.int64)

    def partial(t: pa.Table) -> pa.Table:
        m1 = pc.equal(t[label_col], label_a)
        m2 = pc.equal(t[label_col], label_b)
        keep = pc.or_(m1, m2)
        t = t.filter(keep)
        if t.num_rows == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "c1": pa.array([], pa.int64()),
                             "c2": pa.array([], pa.int64())})
        vals = t[value_col].to_numpy(zero_copy_only=False)
        is1 = pc.equal(t[label_col], label_a).to_numpy(zero_copy_only=False)
        b = bucket_of(vals)
        df = pd.DataFrame({"bucket": b, "c1": is1.astype(np.int64),
                           "c2": (~is1).astype(np.int64)})
        g = df.groupby("bucket", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    grid = (
        ds.select_columns([label_col, value_col])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("bucket", sort=True)
        .sum()
    )
    n1, n2 = int(grid["c1"].sum()), int(grid["c2"].sum())
    out_schema = pa.schema([("ks_d", pa.float64()), ("n1", pa.int64()),
                            ("n2", pa.int64())])
    if n1 == 0 or n2 == 0:
        return ray.data.from_arrow(out_schema.empty_table())
    below1 = grid["c1"].cumsum() - grid["c1"]  # strictly-below offsets
    below2 = grid["c2"].cumsum() - grid["c2"]
    offsets = {int(b): (int(below1.loc[b]), int(below2.loc[b]))
               for b in grid.index}
    offsets_ref = ray.put(offsets)

    def rows(t: pa.Table) -> pa.Table:
        m1 = pc.equal(t[label_col], label_a)
        t2 = t.filter(pc.or_(m1, pc.equal(t[label_col], label_b)))
        vals = t2[value_col].to_numpy(zero_copy_only=False)
        is1 = pc.equal(t2[label_col], label_a).to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array(bucket_of(vals), pa.int64()),
            "value": pa.array(vals, pa.float64()),
            "s1": pa.array(is1.astype(np.int64), pa.int64()),
        })

    def local_max(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"d": pa.array([], pa.float64())})
        off = ray.get(offsets_ref)
        df = t.to_pandas()
        best = 0.0
        for b, sub in df.groupby("bucket", sort=False):
            o1, o2 = off[int(b)]
            g = (sub.groupby("value", sort=True)["s1"]
                 .agg(["sum", "count"]))
            ca = o1 + g["sum"].cumsum().to_numpy(dtype=np.float64)
            cb = o2 + (g["count"] - g["sum"]).cumsum().to_numpy(np.float64)
            d = np.abs(ca / n1 - cb / n2).max()
            best = max(best, float(d))
        return pa.table({"d": pa.array([best], pa.float64())})

    from dedup_ray.util.exchange import exchange_group_apply

    parts = exchange_group_apply(
        ds.select_columns([label_col, value_col])
        .map_batches(rows, batch_format="pyarrow"),
        ["bucket"], local_max, num_partitions,
        empty_schema=pa.schema([("bucket", pa.int64()),
                                ("value", pa.float64()),
                                ("s1", pa.int64())]),
    )
    d = float(max(r["d"] for r in parts.take_all()))  # ≤ num_partitions rows
    return ray.data.from_arrow(pa.table({
        "ks_d": pa.array([round(d, 6)], pa.float64()),
        "n1": pa.array([n1], pa.int64()),
        "n2": pa.array([n2], pa.int64()),
    }))


def gini_entropy(counts_ds, count_col: str = "c"):
    """Concentration indices over a COUNT TABLE (vocab-bounded input, e.g.
    token→frequency): Gini coefficient, Shannon entropy (nats) and
    normalized entropy — one row ``(gini, entropy, norm_entropy, k,
    total)``.  Gini uses the sorted-rank closed form
    ``2·Σ i·c_(i) / (k·Σc) − (k+1)/k`` (ascending; tie order is
    irrelevant — equal values permute without changing the sum).  The
    single gather is bounded by the DISTINCT-KEY cardinality, never the
    corpus — same license as the Zipf fit."""
    out_schema = pa.schema([
        ("gini", pa.float64()), ("entropy", pa.float64()),
        ("norm_entropy", pa.float64()), ("k", pa.int64()),
        ("total", pa.int64()),
    ])

    def reduce_fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        c = np.sort(t[count_col].to_numpy(zero_copy_only=False)
                    .astype(np.float64))
        k, tot = len(c), c.sum()
        i = np.arange(1, k + 1, dtype=np.float64)
        gini = 2.0 * float(i @ c) / (k * tot) - (k + 1) / k
        p = c / tot
        ent = float(-(p * np.log(p)).sum())
        norm = ent / np.log(k) if k > 1 else 0.0
        return pa.table({
            "gini": pa.array([round(gini, 6)], pa.float64()),
            "entropy": pa.array([round(ent, 6)], pa.float64()),
            "norm_entropy": pa.array([round(norm, 6)], pa.float64()),
            "k": pa.array([k], pa.int64()),
            "total": pa.array([int(tot)], pa.int64()),
        })

    from dedup_ray.util.exchange import exchange_group_apply

    return exchange_group_apply(
        counts_ds, [count_col], reduce_fn, num_partitions=1,
        empty_schema=pa.schema([(count_col, pa.int64())]),
    )


def spearman(ds, x_col: str, y_col: str,
             x_bucket: float = 1.0, y_bucket: float = 256.0,
             num_partitions: int = 8):
    """Spearman rank correlation WITHOUT a global sort and WITHOUT a
    row identity: everything runs on VALUE histograms.

    (1) one (x, y)-keyed exchange folds the corpus into the distinct
    value-PAIR histogram ``(x, y, c)`` — Spearman depends on nothing
    else; (2) per column, the bucket-offset trick assigns each DISTINCT
    value its midrank (one bucket-count pass pins strictly-below
    offsets per range bucket — driver state is the bucket grid — then
    one bucket-keyed exchange computes ``midrank = below + (cnt+1)/2``;
    exact because a value's bucket holds its full multiplicity); (3)
    two UNIQUE-key joins tag the pair histogram with (rx, ry) — no
    duplicate-key blowup, by construction; (4) Pearson runs on
    c-weighted CENTERED partials (the midrank mean is EXACTLY (n+1)/2,
    so centering kills the ~n³ cancellation raw rank sums hit at
    corpus scale).  Output one row ``(spearman, n)`` at 6 dp."""
    import ray
    import ray.data

    from dedup_ray.util.exchange import exchange_group_apply, exchange_join

    # ---- (1) distinct (x, y) pair histogram ------------------------------
    def pair_partial(t: pa.Table) -> pa.Table:
        g = pd.DataFrame({
            "x": t[x_col].to_numpy(zero_copy_only=False)
                 .astype(np.float64),
            "y": t[y_col].to_numpy(zero_copy_only=False)
                 .astype(np.float64),
            "c": 1,
        }).groupby(["x", "y"], sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    def pair_fold(t: pa.Table) -> pa.Table:
        g = t.group_by(["x", "y"]).aggregate([("c", "sum")])
        return g.rename_columns(["x", "y", "c"])

    ph_schema = pa.schema([("x", pa.float64()), ("y", pa.float64()),
                           ("c", pa.int64())])
    ph = exchange_group_apply(
        ds.select_columns([x_col, y_col])
        .map_batches(pair_partial, batch_format="pyarrow"),
        ["x", "y"], pair_fold, num_partitions, empty_schema=ph_schema,
    ).materialize()

    # ---- (2) per-column distinct-value midrank maps ----------------------
    def rank_map(col: str, width: float, out: str):
        def vh_partial(t: pa.Table) -> pa.Table:
            g = pd.DataFrame({
                "v": t[col].to_numpy(zero_copy_only=False)
                     .astype(np.float64),
                "c": t["c"].to_numpy(zero_copy_only=False),
            }).groupby("v", sort=False).sum().reset_index()
            g["bucket"] = np.floor(g["v"].to_numpy() / width) \
                .astype(np.int64)
            return pa.Table.from_pandas(g, preserve_index=False)

        vh_schema = pa.schema([("v", pa.float64()), ("c", pa.int64()),
                               ("bucket", pa.int64())])
        vh = exchange_group_apply(
            ph.map_batches(vh_partial, batch_format="pyarrow"),
            ["v"], lambda t: (t.group_by(["v", "bucket"])
                              .aggregate([("c", "sum")])
                              .rename_columns(["v", "bucket", "c"])),
            num_partitions, empty_schema=vh_schema,
        ).materialize()

        grid = (vh.map_batches(
            lambda t: (t.group_by("bucket").aggregate([("c", "sum")])
                       .rename_columns(["bucket", "c"])),
            batch_format="pyarrow")
            .to_pandas().groupby("bucket", sort=True).sum())
        below = (grid["c"].cumsum() - grid["c"]).astype(np.int64)
        offsets_ref = ray.put({int(b): int(below.loc[b])
                               for b in grid.index})
        total = int(grid["c"].sum())

        def assign(t: pa.Table) -> pa.Table:
            out_schema = pa.schema([(col, pa.float64()),
                                    (out, pa.float64())])
            if t.num_rows == 0:
                return out_schema.empty_table()
            off = ray.get(offsets_ref)
            df = t.to_pandas().groupby(["bucket", "v"], sort=True) \
                  .sum().reset_index()
            outs = []
            for b, sub in df.groupby("bucket", sort=False):
                o = off[int(b)]
                below_in = sub["c"].cumsum() - sub["c"]
                mid = o + below_in + (sub["c"] + 1) / 2.0
                outs.append(pd.DataFrame({col: sub["v"], out: mid}))
            res = pd.concat(outs, ignore_index=True)
            return pa.Table.from_pandas(res, preserve_index=False)

        return exchange_group_apply(
            vh, ["bucket"], assign, num_partitions,
            empty_schema=vh_schema,
        ), total

    xmap, n = rank_map("x", x_bucket, "rx")
    ymap, _ = rank_map("y", y_bucket, "ry")

    out_schema = pa.schema([("spearman", pa.float64()), ("n", pa.int64())])
    if n == 0:
        return ray.data.from_arrow(out_schema.empty_table())
    mu = (n + 1) / 2.0  # exact midrank mean

    # ---- (3) unique-key tag joins ---------------------------------------
    j1 = exchange_join(
        ph, xmap, on="x", num_partitions=num_partitions,
        empty_schema=pa.schema([("x", pa.float64()), ("y", pa.float64()),
                                ("c", pa.int64()), ("rx", pa.float64())]),
    )
    j2 = exchange_join(
        j1, ymap, on="y", num_partitions=num_partitions,
        empty_schema=pa.schema([("x", pa.float64()), ("y", pa.float64()),
                                ("c", pa.int64()), ("rx", pa.float64()),
                                ("ry", pa.float64())]),
    )

    # ---- (4) c-weighted centered Pearson partials ------------------------
    def sums(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.float64)
        x = t["rx"].to_numpy(zero_copy_only=False) - mu
        y = t["ry"].to_numpy(zero_copy_only=False) - mu
        return pa.table({
            "n": pa.array([float(c.sum())], pa.float64()),
            "sx": pa.array([float((c * x).sum())], pa.float64()),
            "sy": pa.array([float((c * y).sum())], pa.float64()),
            "sxy": pa.array([float((c * x * y).sum())], pa.float64()),
            "sxx": pa.array([float((c * x * x).sum())], pa.float64()),
            "syy": pa.array([float((c * y * y).sum())], pa.float64()),
        })

    p = j2.map_batches(sums, batch_format="pyarrow").to_pandas()
    nn = float(p["n"].sum())
    sx, sy = p["sx"].sum(), p["sy"].sum()
    sxy, sxx, syy = p["sxy"].sum(), p["sxx"].sum(), p["syy"].sum()
    num = sxy - sx * sy / nn
    den = np.sqrt((sxx - sx * sx / nn) * (syy - sy * sy / nn))
    if den == 0:
        return ray.data.from_arrow(out_schema.empty_table())
    return ray.data.from_arrow(pa.table({
        "spearman": pa.array([round(float(num / den), 6)], pa.float64()),
        "n": pa.array([int(nn)], pa.int64()),
    }))


def benford_audit(ds, value_col: str, int_scale: int = 100,
                  num_partitions: int = 1):
    """Benford's-law first-digit audit of a positive numeric column:
    observed first-significant-digit counts vs the log10(1+1/d)
    expectation, plus the chi-squared divergence — the classic
    fabricated-data / synthetic-feed screen.

    Digit extraction is EXACT and engine-independent: the value is
    scaled to an integer at the column's native decimal precision
    (``round(v · int_scale)``, one multiply + round — never the
    ``floor(v / 10^floor(log10 v))`` form, whose libm pow/log10 differ
    by 1 ulp between engines and flip boundary values like 5.9999…↔6)
    and the digit is the first character of the int64's decimal string.
    Values below ``1/int_scale`` are excluded (documented domain).
    9-cell partials, one tiny reduce.  Output:
    ``(digit, n, expected, p_obs, chi2)`` (chi2 repeated per row)."""
    out_schema = pa.schema([("digit", pa.int64()), ("n", pa.int64()),
                            ("expected", pa.float64()),
                            ("p_obs", pa.float64()),
                            ("chi2", pa.float64())])

    def partial(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[np.isfinite(v) & (v > 0)]
        s = np.round(v * int_scale).astype(np.int64)
        s = s[s >= 1]
        if len(s) == 0:
            return pa.table({"digit": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        d = s.astype("U20").astype("U1").astype(np.int64)
        g = pd.DataFrame({"digit": d, "c": 1}) \
            .groupby("digit", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    def reduce_fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas().groupby("digit", sort=True).sum()
        full = df.reindex(range(1, 10), fill_value=0)
        n = float(full["c"].sum())
        digits = np.arange(1, 10)
        exp_p = np.log10(1.0 + 1.0 / digits)
        obs = full["c"].to_numpy(dtype=np.float64)
        chi2 = round(float((((obs - n * exp_p) ** 2) / (n * exp_p)).sum()),
                     6)
        return pa.table({
            "digit": pa.array(digits, pa.int64()),
            "n": pa.array(obs.astype(np.int64), pa.int64()),
            "expected": pa.array(np.round(n * exp_p, 6), pa.float64()),
            "p_obs": pa.array(np.round(obs / n, 6), pa.float64()),
            "chi2": pa.array([chi2] * 9, pa.float64()),
        })

    from dedup_ray.util.exchange import exchange_group_apply

    return exchange_group_apply(
        ds.select_columns([value_col])
        .map_batches(partial, batch_format="pyarrow"),
        ["digit"], reduce_fn, num_partitions=1,
        empty_schema=pa.schema([("digit", pa.int64()),
                                ("c", pa.int64())]),
    )


def kaplan_meier(ds, user_col: str, ts_col: str,
                 censor_horizon_days: int = 7, num_partitions: int = 8):
    """Kaplan–Meier survival estimate over user LIFETIMES (first→last
    event): the retention curve with right-censoring done honestly —
    a user whose last event falls within ``censor_horizon_days`` of the
    corpus end may still be alive, so they count as AT RISK but never
    as a death.  ``S(t) = Π_{t_i ≤ t} (1 − d_i / n_i)`` over distinct
    observed lifetimes (in whole days).

    One user-keyed exchange folds (first, last) per user; the
    duration table that reaches the single reduce is user-bounded and
    the curve itself is distinct-duration-bounded.  The corpus end is
    one driver-side MAX.  Output: ``(t_days, at_risk, deaths,
    survival)`` at 6 dp, one row per distinct death time."""
    import ray

    from dedup_ray.util.exchange import exchange_group_apply

    max_ts = ds.max(ts_col)  # one scalar to the driver
    max_us = int(pd.Timestamp(max_ts).value // 1000)
    horizon_us = censor_horizon_days * 86_400_000_000

    def per_user(part: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        if part.num_rows == 0:
            return pa.table({"dur": pa.array([], pa.int64()),
                             "death": pa.array([], pa.int64())})
        # normalize the unit explicitly: a timestamp[ns] input (pandas-
        # born) would otherwise inflate day math 1000x
        us = pc.cast(pc.cast(part[ts_col], pa.timestamp("us")), pa.int64())
        df = pd.DataFrame({
            "u": part[user_col].to_numpy(zero_copy_only=False),
            "ts": us.to_numpy(zero_copy_only=False),
        })
        g = df.groupby("u").agg(first=("ts", "min"), last=("ts", "max"))
        dur = ((g["last"] - g["first"]) // 86_400_000_000).astype(np.int64)
        death = (g["last"] < max_us - horizon_us).astype(np.int64)
        return pa.table({"dur": pa.array(dur.to_numpy(), pa.int64()),
                         "death": pa.array(death.to_numpy(), pa.int64())})

    durs = exchange_group_apply(
        ds.select_columns([user_col, ts_col]), [user_col], per_user,
        num_partitions,
        empty_schema=pa.schema([(user_col, pa.int64()),
                                (ts_col, pa.timestamp("us"))]),
    )

    out_schema = pa.schema([("t_days", pa.int64()), ("at_risk", pa.int64()),
                            ("deaths", pa.int64()),
                            ("survival", pa.float64())])

    def km(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas().groupby("dur").agg(
            n=("death", "size"), d=("death", "sum")).sort_index()
        total = int(df["n"].sum())
        ts, ns, dss, ss = [], [], [], []
        s = 1.0
        removed = 0
        for dur, row in df.iterrows():
            at_risk = total - removed
            removed += int(row["n"])
            if row["d"] == 0:
                continue  # censored-only time: no curve step
            s = s * (1.0 - float(row["d"]) / at_risk)
            ts.append(int(dur))
            ns.append(at_risk)
            dss.append(int(row["d"]))
            ss.append(round(s, 6))
        return pa.table({"t_days": pa.array(ts, pa.int64()),
                         "at_risk": pa.array(ns, pa.int64()),
                         "deaths": pa.array(dss, pa.int64()),
                         "survival": pa.array(ss, pa.float64())})

    return exchange_group_apply(
        durs, ["dur"], km, num_partitions=1,
        empty_schema=pa.schema([("dur", pa.int64()),
                                ("death", pa.int64())]),
    )


def isotonic_calibration(ds, x_col: str, y_col: str,
                         num_partitions: int = 8):
    """Isotonic (monotone non-decreasing) calibration of a score
    against outcomes — PAVA's result computed by the MINIMAX closed
    form instead of the sequential pooling loop:
    ``ŷ_i = max_{j≤i} min_{k≥i} avg(y over scores j..k)`` — because the
    closed form is two windowed scans (suffix-min over k, then
    prefix-max over j) on the weighted-average matrix, the oracle can
    replay it with window functions, where PAVA's data-dependent merge
    order could not be unrolled.

    The corpus folds to the DISTINCT-SCORE-bounded (x, w, Σy) table
    before the single reduce.  The ENGINE computes the fit by PAVA
    pooling — O(n) after the sort, vs the closed form's dense n×n
    matrix, which at 30k distinct scores cost ~15 s and gigabytes
    (round-3 bench tail) — while the ORACLE keeps the windowed-scan
    minimax SQL; the two are the same function, and block averages here
    are computed from the same cumsum arrays the scans read, so after
    the 6-dp round the outputs agree.  Output: ``(x, n, rate, iso)`` —
    raw and calibrated outcome rates, 6 dp.
    """
    from dedup_ray.util.exchange import exchange_group_apply

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "x": t[x_col].to_numpy(zero_copy_only=False),
            "w": 1,
            "sy": t[y_col].to_numpy(zero_copy_only=False)
                  .astype(np.float64),
        })
        g = df.groupby("x", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    out_schema = pa.schema([("x", pa.float64()), ("n", pa.int64()),
                            ("rate", pa.float64()), ("iso", pa.float64())])

    def reduce_fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas().groupby("x", sort=True).sum()
        x = df.index.to_numpy(dtype=np.float64)
        w = df["w"].to_numpy(dtype=np.float64)
        sy = df["sy"].to_numpy(dtype=np.float64)
        n = len(x)
        cw = np.concatenate([[0.0], np.cumsum(w)])
        cy = np.concatenate([[0.0], np.cumsum(sy)])

        def blk_avg(s: int, e: int) -> float:
            # avg over scores s..e inclusive, the closed form's cell
            return (cy[e + 1] - cy[s]) / (cw[e + 1] - cw[s])

        # PAVA: maintain a stack of maximal blocks with non-decreasing
        # averages; merging two adjacent violators never changes the
        # final fit (Ayer et al. 1955), and the result equals the
        # minimax closed form the oracle replays
        starts: list[int] = []
        avgs: list[float] = []
        for i in range(n):
            starts.append(i)
            avgs.append(blk_avg(i, i))
            while len(starts) > 1 and avgs[-1] <= avgs[-2]:
                starts.pop()
                avgs.pop()
                avgs[-1] = blk_avg(starts[-1], i)
        iso = np.empty(n, np.float64)
        bounds = starts + [n]
        for bi in range(len(starts)):
            iso[bounds[bi]:bounds[bi + 1]] = avgs[bi]
        return pa.table({
            "x": pa.array(x, pa.float64()),
            "n": pa.array(w.astype(np.int64), pa.int64()),
            "rate": pa.array(np.round(sy / w, 6), pa.float64()),
            "iso": pa.array(np.round(iso, 6), pa.float64()),
        })

    return exchange_group_apply(
        ds.select_columns([x_col, y_col])
        .map_batches(partial, batch_format="pyarrow"),
        ["x"], reduce_fn, num_partitions=1,
        empty_schema=pa.schema([("x", pa.float64()), ("w", pa.int64()),
                                ("sy", pa.float64())]),
    )


def correlation_matrix(ds, cols: list, num_partitions: int = 1):
    """Pairwise Pearson correlation matrix over ``cols`` from ONE pass
    of moment partials (per batch: n, Σx_i, Σx_i·x_j — k(k+3)/2
    floats), driver-free single reduce — the quality-signal redundancy
    audit (two metrics correlating at 0.98 are one metric).  Output
    long form ``(m1, m2, corr)`` for m1 < m2 (column-name order), 6 dp;
    zero-variance columns emit NULL-free rows only for defined pairs.
    """
    k = len(cols)

    def partial(t: pa.Table) -> pa.Table:
        X = np.stack([t[c].to_numpy(zero_copy_only=False)
                      .astype(np.float64) for c in cols], axis=1)
        out = {"n": pa.array([float(len(X))], pa.float64())}
        for i in range(k):
            out[f"s{i}"] = pa.array([float(X[:, i].sum())], pa.float64())
            for j in range(i, k):
                out[f"p{i}_{j}"] = pa.array(
                    [float((X[:, i] * X[:, j]).sum())], pa.float64())
        return pa.table(out)

    out_schema = pa.schema([("m1", pa.string()), ("m2", pa.string()),
                            ("corr", pa.float64())])

    def reduce_fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas().sum()
        n = df["n"]
        m1s, m2s, cs = [], [], []
        for i in range(k):
            for j in range(i + 1, k):
                num = df[f"p{i}_{j}"] - df[f"s{i}"] * df[f"s{j}"] / n
                d1 = df[f"p{i}_{i}"] - df[f"s{i}"] ** 2 / n
                d2 = df[f"p{j}_{j}"] - df[f"s{j}"] ** 2 / n
                if d1 <= 0 or d2 <= 0:
                    continue
                m1s.append(cols[i])
                m2s.append(cols[j])
                cs.append(round(float(num / np.sqrt(d1 * d2)), 6))
        return pa.table({"m1": pa.array(m1s, pa.string()),
                         "m2": pa.array(m2s, pa.string()),
                         "corr": pa.array(cs, pa.float64())})

    from dedup_ray.util.exchange import exchange_group_apply

    return exchange_group_apply(
        ds.select_columns(cols).map_batches(partial,
                                            batch_format="pyarrow"),
        ["n"], reduce_fn, num_partitions=1,
        empty_schema=pa.schema(
            [("n", pa.float64())]
            + [(f"s{i}", pa.float64()) for i in range(k)]
            + [(f"p{i}_{j}", pa.float64())
               for i in range(k) for j in range(i, k)]),
    )


def holt_forecast(ds, group_col: str, ts_col: str,
                  alpha: float = 0.5, beta: float = 0.3,
                  bucket_us: int = 3_600_000_000,
                  num_partitions: int = 8):
    """Holt's linear (double-exponential) smoothing over the per-group
    hourly count series (Holt 1957) — the trend-aware upgrade of the
    EWMA monitor: level ``l_t = α·x_t + (1−α)(l_{t−1} + b_{t−1})``,
    trend ``b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}``, one-step forecast
    ``l_t + b_t`` — the drift detector that does not lag a steadily
    growing feed the way a flat EWMA does.

    Init: ``l_0 = x_0``, ``b_0 = x_1 − x_0`` (0 when the grid has one
    bucket).  The hour grid spans the global [min, max] timestamp (two
    driver scalars), missing hours count 0.  One group-keyed exchange;
    per-group state is hours-bounded; the recurrence runs in IDENTICAL
    operand order in this kernel and the oracle's recursive CTE
    (``b_t`` re-evaluates the ``l_t`` expression rather than reusing
    the variable, because the SQL recursion must).

    Output: ``(group, hour, level, trend, forecast)`` rounded 6dp.
    """
    import pandas as pd
    import pyarrow.compute as pc

    from dedup_ray.util.exchange import exchange_group_apply

    lo = pd.Timestamp(ds.min(ts_col)).value // 1000
    hi = pd.Timestamp(ds.max(ts_col)).value // 1000
    h0, h1 = lo // bucket_us, hi // bucket_us
    n_hours = int(h1 - h0 + 1)
    a, b1 = float(alpha), float(beta)
    one_a, one_b = 1.0 - a, 1.0 - b1

    out_schema = pa.schema([
        (group_col, pa.string()), ("hour", pa.int64()),
        ("level", pa.float64()), ("trend", pa.float64()),
        ("forecast", pa.float64()),
    ])

    def per_group(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        df = pd.DataFrame({
            "g": t[group_col].to_pylist(),
            "h": (us.to_numpy(zero_copy_only=False) // bucket_us) - h0,
        })
        gs, hs, ls, bs, fs = [], [], [], [], []
        for g, sub in df.groupby("g", sort=True):
            x = np.zeros(n_hours, np.float64)
            cnt = sub.groupby("h").size()
            x[cnt.index.to_numpy()] = cnt.to_numpy().astype(np.float64)
            lv = x[0]
            tr = (x[1] - x[0]) if n_hours > 1 else 0.0
            gs.append(g)
            hs.append(int(h0))
            ls.append(lv)
            bs.append(tr)
            fs.append(lv + tr)
            for h in range(1, n_hours):
                prev_l, prev_b = lv, tr
                lv = a * x[h] + one_a * (prev_l + prev_b)
                # identical operand order to the SQL recursion, which
                # re-evaluates the level expression inside the trend
                tr = b1 * ((a * x[h] + one_a * (prev_l + prev_b))
                           - prev_l) + one_b * prev_b
                gs.append(g)
                hs.append(int(h0 + h))
                ls.append(lv)
                bs.append(tr)
                fs.append(lv + tr)
        def r6(v):  # floor(x·1e6 + 0.5)/1e6 — engine-identical rounding
            return np.floor(np.asarray(v) * 1e6 + 0.5) / 1e6

        return pa.table({
            group_col: pa.array(gs, pa.string()),
            "hour": pa.array(hs, pa.int64()),
            "level": pa.array(r6(ls), pa.float64()),
            "trend": pa.array(r6(bs), pa.float64()),
            "forecast": pa.array(r6(fs), pa.float64()),
        })

    return exchange_group_apply(
        ds.map_batches(
            lambda t: t.select([group_col, ts_col]),
            batch_format="pyarrow"),
        [group_col], per_group, num_partitions,
        empty_schema=pa.schema([(group_col, pa.string()),
                                (ts_col, pa.timestamp("us"))]),
    )
