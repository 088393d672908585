"""Deterministic weighted dataset mixing.

Training-corpus recipes weight sources differently ("wiki ×2.5, common
crawl ×0.3").  At 100 TB the mix must be computable without a shuffle,
reproducible across retries and engines, and exact — not "approximately
30%" but the SAME documents every run.  The standard device: a document
of weight ``w`` appears ``floor(w)`` times unconditionally (epochs
``0..floor(w)-1``) plus once more (epoch ``floor(w)``) iff a keyed hash
of ``(seed, epoch, id)`` falls under the fractional part.

The hash test is md5 — public, so any engine recomputes membership from
``(id, seed)`` alone (same rationale as ``stages/ordering.shuffle_rank``)
— and the comparison is LEXICOGRAPHIC on the first 8 hex chars against a
precomputed 8-hex-char threshold: equal-length lowercase hex compares
identically as string or integer, so the engine and a SQL oracle need no
integer parsing to agree bit-for-bit (:func:`frac_threshold_hex`,
:func:`mix_sql`).

One streaming map over the corpus, output O(Σwᵢ·nᵢ) rows, no shuffle.
Downstream, ``shuffle_rank`` over the (id, epoch) pairs gives the
reproducible training order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from dedup_ray.util.hashing import content_digest


def frac_threshold_hex(weight: float) -> str:
    """8-hex-char threshold for the fractional epoch: keep iff
    ``md5(f"{seed}:{epoch}:{id}")[:8] < threshold``."""
    frac = weight - int(weight)
    return format(min(int(frac * 2**32), 2**32 - 1), "08x")


def mix_sources(
    ds,
    weights: dict[str, float],
    id_col: str = "doc_id",
    source_col: str = "source",
    seed: int = 42,
    default_weight: float = 1.0,
):
    """Weighted mixture over a corpus with a source tag column.

    Output rows ``(id_col, source_col, epoch)``: each input row of source
    ``s`` (weight ``w = weights.get(s, default_weight)``) appears with
    ``epoch = 0..floor(w)-1`` always and ``epoch = floor(w)`` iff its
    keyed md5 prefix clears :func:`frac_threshold_hex`.  Deterministic in
    (id, seed) — partitioning-independent, resumable, engine-portable.
    """
    if any(w < 0 for w in weights.values()) or default_weight < 0:
        raise ValueError("mixture weights must be nonnegative")

    def f(t: pa.Table) -> pa.Table:
        idt = t[id_col].type
        if t.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], idt),
                    source_col: pa.array([], pa.string()),
                    "epoch": pa.array([], pa.int64()),
                }
            )
        ids = t[id_col].to_numpy(zero_copy_only=False)
        src = np.asarray(t[source_col].to_pylist(), dtype=object)
        w = np.array(
            [weights.get(s, default_weight) for s in src], dtype=np.float64
        )
        full = w.astype(np.int64)  # floor for w >= 0

        out_ids, out_src, out_ep = [], [], []
        # full epochs: every row with floor(w) > e, batched per epoch so
        # the work is O(output rows), all numpy gathers
        for e in range(int(full.max(initial=0))):
            m = full > e
            out_ids.append(ids[m])
            out_src.append(src[m])
            out_ep.append(np.full(int(m.sum()), e, dtype=np.int64))

        # fractional epoch: md5 prefix under the per-source threshold
        fm = w > full
        if fm.any():
            f_ids, f_src, f_full = ids[fm], src[fm], full[fm]
            dg = content_digest(
                [
                    f"{seed}:{e}:{v}"
                    for e, v in zip(f_full.tolist(), f_ids.tolist())
                ],
                algo="md5",
            )
            pref = np.array([d[:8] for d in dg])
            thr = np.array(
                [
                    frac_threshold_hex(weights.get(s, default_weight))
                    for s in f_src
                ]
            )
            keep = pref < thr
            out_ids.append(f_ids[keep])
            out_src.append(f_src[keep])
            out_ep.append(f_full[keep])

        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_ids), idt)
                if out_ids
                else pa.array([], idt),
                source_col: pa.array(
                    np.concatenate(out_src) if out_src else [], pa.string()
                ),
                "epoch": pa.array(
                    np.concatenate(out_ep) if out_ep else [], pa.int64()
                ),
            }
        )

    return ds.select_columns([id_col, source_col]).map_batches(
        f, batch_format="pyarrow"
    )


def mix_sql(
    weights: dict[str, float],
    table: str = "documents",
    id_col: str = "doc_id",
    source_col: str = "source",
    seed: int = 42,
    default_weight: float = 1.0,
) -> str:
    """DuckDB query equivalent to :func:`mix_sources`, generated from the
    SAME weights dict (thresholds shared via :func:`frac_threshold_hex`,
    membership via lexicographic md5-prefix compare)."""
    w_case = "CASE " + " ".join(
        f"WHEN {source_col} = '{s}' THEN CAST({int(w)} AS BIGINT)"
        for s, w in weights.items()
    ) + f" ELSE CAST({int(default_weight)} AS BIGINT) END"
    t_case = "CASE " + " ".join(
        f"WHEN {source_col} = '{s}' THEN '{frac_threshold_hex(w)}'"
        for s, w in weights.items()
    ) + f" ELSE '{frac_threshold_hex(default_weight)}' END"
    max_epochs = int(
        max(list(weights.values()) + [default_weight])
    ) + 1
    return f"""
        WITH w AS (
            SELECT {id_col}, {source_col},
                   {w_case} AS full_epochs, {t_case} AS thr
            FROM {table}
        ),
        e AS (SELECT unnest(range({max_epochs})) AS epoch)
        SELECT w.{id_col}, w.{source_col}, CAST(e.epoch AS BIGINT) AS epoch
        FROM w JOIN e ON e.epoch <= w.full_epochs
        WHERE e.epoch < w.full_epochs
           OR substr(md5('{seed}' || ':' || e.epoch || ':' || w.{id_col}),
                     1, 8) < w.thr
    """


def split_thresholds_hex(fractions: dict[str, float]) -> list[tuple[str, str]]:
    """[(split_name, cumulative 8-hex upper bound)], last bound = 'ffffffff'+.

    Cumulative fractions land on the same 32-bit grid as
    :func:`frac_threshold_hex`, so engine and SQL oracle share the exact
    boundary strings.
    """
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError("split fractions must sum to 1")
    out, cum = [], 0.0
    names = list(fractions)
    for i, name in enumerate(names):
        cum += fractions[name]
        bound = (
            "g" * 8  # lexicographically above every hex digest prefix
            if i == len(names) - 1
            else format(min(int(cum * 2**32), 2**32 - 1), "08x")
        )
        out.append((name, bound))
    return out


def split_assign(
    ds,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 42,
    keep_cols: tuple = (),
):
    """Deterministic train/val/test assignment by keyed md5 bucket.

    ``split = first name whose cumulative bound exceeds
    md5(f"{seed}:split:{id}")[:8]`` — a pure function of (id, seed): no
    shuffle, stable under repartitioning/retries/appends (a new document
    never moves an old one between splits), and reproducible by any
    engine.  The ':split:' salt decorrelates it from the mixing-epoch
    hash so splitting and up-weighting stay independent decisions.
    """
    bounds = split_thresholds_hex(fractions)

    def f(t: pa.Table) -> pa.Table:
        idt = t[id_col].type
        if t.num_rows == 0:
            cols = {id_col: pa.array([], idt)}
            for c in keep_cols:
                cols[c] = pa.array([], t[c].type)
            cols["split"] = pa.array([], pa.string())
            return pa.table(cols)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        pref = np.array(
            [
                d[:8]
                for d in content_digest(
                    [f"{seed}:split:{v}" for v in ids.tolist()], algo="md5"
                )
            ]
        )
        split = np.full(len(ids), bounds[-1][0], dtype=object)
        assigned = np.zeros(len(ids), dtype=bool)
        for name, bound in bounds[:-1]:
            m = ~assigned & (pref < bound)
            split[m] = name
            assigned |= m
        cols = {id_col: t[id_col]}
        for c in keep_cols:
            cols[c] = t[c]
        cols["split"] = pa.array(split, pa.string())
        return pa.table(cols)

    return ds.select_columns([id_col, *keep_cols]).map_batches(
        f, batch_format="pyarrow"
    )


def split_case_expr(
    fractions: dict[str, float], id_col: str = "doc_id", seed: int = 42
) -> str:
    """The split-assignment CASE expression alone, for embedding in larger
    generated oracles (boundary hex strings shared via
    :func:`split_thresholds_hex`)."""
    bounds = split_thresholds_hex(fractions)
    if len(bounds) == 1:  # degenerate single split: a bare literal
        return f"'{bounds[-1][0]}'"
    whens = " ".join(
        f"WHEN substr(md5('{seed}' || ':split:' || {id_col}), 1, 8) "
        f"< '{bound}' THEN '{name}'"
        for name, bound in bounds[:-1]
    )
    return f"CASE {whens} ELSE '{bounds[-1][0]}' END"


def split_sql(
    fractions: dict[str, float],
    table: str = "documents",
    id_col: str = "doc_id",
    seed: int = 42,
) -> str:
    """DuckDB query equivalent to :func:`split_assign`, generated from the
    SAME fractions dict."""
    case = split_case_expr(fractions, id_col=id_col, seed=seed)
    return f"""
        SELECT {id_col}, {case} AS split
        FROM {table}
    """


def pseudonymize(ds, cols: list[str], secret: str):
    """Replace identifier columns with deterministic keyed tokens:
    ``md5(f"{secret}:{value}")[:16]`` — equal values map to equal tokens,
    so grouping and joins still work across tables pseudonymized with
    the same secret, while raw identifiers never leave the task.

    md5 keeps the op oracle-checkable (the ``shuffle_rank`` doctrine:
    public-spec hashes where the hash IS the contract); for adversarial
    settings swap in the engine's keyed BLAKE2b (``util/hashing``) and
    give up the SQL oracle.  Shuffle-free, one pass.
    """
    from dedup_ray.util.hashing import content_digest

    def f(t: pa.Table) -> pa.Table:
        arrays, names = [], []
        for c in t.column_names:
            if c in cols:
                vals = t[c].to_pylist()
                dg = content_digest([f"{secret}:{v}" for v in vals],
                                    algo="md5")
                arrays.append(pa.array([d[:16] for d in dg], pa.string()))
                names.append(c + "_token")
            else:
                arrays.append(t[c])
                names.append(c)
        return pa.table(dict(zip(names, arrays)))

    return ds.map_batches(f, batch_format="pyarrow")


def stratified_sample(ds, fractions: dict[str, float], group_col: str,
                      id_col: str = "doc_id", seed: int = 42):
    """Per-group deterministic sampling: keep a row iff
    ``md5(f"{seed}:strat:{id}")[:8]`` clears its group's fraction
    threshold — the per-language downsampling step of a corpus recipe
    ("keep 30%% of en, all of de"), shuffle-free and append-stable like
    :func:`split_assign` (a new document never flips an old one's fate).
    Groups absent from ``fractions`` are dropped (an explicit recipe
    beats a silent keep-all default).
    """
    # f >= 1.0 means KEEP ALL: the threshold string 'g' sorts above every
    # 8-hex-digit prefix, so no row can be dropped (a saturated 'ffffffff'
    # bound with strict '<' would drop the ~2^-32 rows whose md5 prefix is
    # exactly 'ffffffff' — ADVICE r2)
    thr = {g: ("g" if f >= 1.0 else format(max(int(f * 2**32), 0), "08x"))
           for g, f in fractions.items()}

    def f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        ids = t[id_col].to_numpy(zero_copy_only=False)
        groups = t[group_col].to_pylist()
        pref = np.array([
            d[:8] for d in content_digest(
                [f"{seed}:strat:{v}" for v in ids.tolist()], algo="md5")
        ])
        bounds = np.array([thr.get(g, "") for g in groups])
        return t.filter(pa.array(pref < bounds))

    return ds.map_batches(f, batch_format="pyarrow")


def stratified_sample_sql(fractions: dict[str, float], group_col: str,
                          table: str = "documents",
                          id_col: str = "doc_id", seed: int = 42) -> str:
    """Generated oracle for :func:`stratified_sample` (same dict/seed)."""
    cases = " ".join(
        f"WHEN '{g}' THEN "
        f"""'{"g" if f >= 1.0 else format(max(int(f * 2**32), 0), "08x")}'"""
        for g, f in fractions.items()
    )
    return f"""
        SELECT * FROM {table}
        WHERE substr(md5('{seed}' || ':strat:' || {id_col}), 1, 8)
              < CASE {group_col} {cases} ELSE '' END
    """


def weighted_sample(ds, k: int, weight_col: str, id_col: str = "doc_id",
                    seed: int = 42):
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    each row draws a deterministic uniform ``u`` from its keyed md5 and
    ranks by ``u^(1/w)``; the global top-``k`` is a weighted sample —
    the "sample documents proportionally to quality" step of a recipe,
    reproducible by any engine from (id, seed, weight) alone.

    Per batch only the local top-``k`` candidates survive
    (``np.argpartition``), so the final sort sees at most
    ``k x n_batches`` rows.  Rows with ``w <= 0`` are excluded.  Returns
    ``(id_col, weight_col)``; ordering ties break by id.
    """

    def partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        live = w > 0
        ids, w = ids[live], w[live]
        if len(ids) == 0:
            return pa.table({id_col: pa.array([], t[id_col].type),
                             weight_col: pa.array([], pa.float64()),
                             "skey": pa.array([], pa.float64())})
        dg = content_digest([f"{seed}:wsample:{v}" for v in ids.tolist()],
                            algo="md5")
        u = (np.array([int(d[:8], 16) for d in dg], np.float64) + 0.5) \
            / 2.0 ** 32
        # coarsened rank key: a 1-ulp libm divergence between numpy's
        # pow and another engine's near the top-k boundary must not flip
        # the selection (ADVICE r2), so both kernel and oracle rank on
        # the key rounded to 12 digits (ties then break by id)
        key = np.round(u ** (1.0 / w), 12)
        if len(ids) > k:
            top = np.argpartition(-key, k - 1)[:k]
            ids, w, key = ids[top], w[top], key[top]
        return pa.table({id_col: pa.array(ids, t[id_col].type),
                         weight_col: pa.array(w, pa.float64()),
                         "skey": pa.array(key, pa.float64())})

    cands = ds.map_batches(partial, batch_format="pyarrow")
    return cands.sort(["skey", id_col], descending=[True, False]) \
        .limit(k).drop_columns(["skey"])


def weighted_sample_sql(k: int, weight_col: str, table: str = "documents",
                        id_col: str = "doc_id", seed: int = 42) -> str:
    """Generated oracle for :func:`weighted_sample` — same u and key
    formulas, same tie-break."""
    return f"""
        SELECT {id_col}, {weight_col}::DOUBLE AS {weight_col} FROM (
            SELECT {id_col}, {weight_col},
                   round(pow((('0x' || substr(md5('{seed}:wsample:'
                                                  || {id_col}), 1, 8))::BIGINT
                              + 0.5) / 4294967296.0,
                             1.0 / {weight_col}), 12) AS skey
            FROM {table} WHERE {weight_col} > 0)
        ORDER BY skey DESC, {id_col} LIMIT {k}
    """


def rendezvous_shard(ds, id_col: str, n_shards: int,
                     out_col: str = "shard", seed: str = "rdz"):
    """Rendezvous (highest-random-weight) shard assignment: each row goes
    to ``argmax over s in [0, n_shards) of md5(f"{seed}:{id}:{s}")``
    (Thaler & Ravishankar 1996 — the consistent-placement primitive
    behind cache rings and shard maps).  The property that matters at
    scale: growing ``n_shards`` by one moves EXACTLY the rows whose new
    shard wins the argmax — an expected 1/(n+1) of the corpus — whereas
    ``hash % n`` moves (n-1)/n of it.  Use it to keep dedup-index
    shards, output partitions and actor ownership stable across
    resizes.

    Per-batch vectorized over the id column (one digest pass per
    shard); shuffle-free.  md5 keeps the assignment SQL-replayable
    (ties, measure-zero at 2^-64, break toward the smaller shard id via
    strict '>').
    """
    import pyarrow.compute as pc

    from dedup_ray.util.hashing import content_digest

    def f(t: pa.Table) -> pa.Table:
        ids = pc.cast(t[id_col], pa.string()).to_pylist()
        best = np.zeros(len(ids), np.uint64)
        shard = np.zeros(len(ids), np.int64)
        for s in range(n_shards):
            dg = content_digest([f"{seed}:{i}:{s}" for i in ids],
                                algo="md5")
            w = np.array([int(d[:16], 16) for d in dg], dtype=np.uint64)
            better = w > best
            best[better] = w[better]
            shard[better] = s
        return t.append_column(out_col, pa.array(shard, pa.int64()))

    return ds.map_batches(f, batch_format="pyarrow")


def rendezvous_shard_sql(id_expr: str, n_shards: int, seed: str = "rdz",
                         out_col: str = "shard") -> str:
    """DuckDB expression replaying :func:`rendezvous_shard`'s argmax —
    one scalar subquery over ``range(n_shards)`` ordered by the same
    hex16 weight (string order == uint64 order), smaller shard id wins
    ties."""
    return (
        f"(SELECT s FROM (SELECT unnest(range({n_shards})) AS s) "
        f"ORDER BY substr(md5('{seed}:' || {id_expr} || ':' || s), 1, 16) "
        f"DESC, s ASC LIMIT 1) AS {out_col}"
    )


# Poisson(1) CDF thresholds, shared verbatim with the SQL oracle so both
# engines make identical branch decisions on identical u doubles.
POISSON1_CDF = (0.36787944117144233, 0.7357588823428847,
                0.9196986029286058, 0.9810118431238463,
                0.9963401531726563, 0.9994058151824183)


def poisson_bootstrap_mean(ds, value_col: str, id_col: str = "doc_id",
                           n_reps: int = 20, seed: str = "boot"):
    """Poisson-bootstrap replicate means — confidence intervals for a
    corpus statistic WITHOUT resampling the corpus: replicate ``r``
    weights every row by an independent Poisson(1) draw (Chamandy et
    al. 2012, the streaming/sharded bootstrap — at corpus scale true
    resampling is impossible, but Poisson weights are row-local), so
    all ``n_reps`` replicates accumulate in ONE streaming pass of
    per-batch partial (Σw, Σw·x) sums.

    The draw is md5-deterministic: ``u = md5(f"{seed}:{id}:{r}")``
    (hex16 fraction), inverse-CDF'd through the shared
    ``POISSON1_CDF`` thresholds (capped at 6) — every weight, and
    therefore every replicate mean, replays exactly in SQL.  Returns
    ``(rep, boot_mean)``, one row per replicate; the spread of
    ``boot_mean`` IS the sampling distribution of the mean.
    """
    import pyarrow.compute as pc

    from dedup_ray.util.hashing import content_digest

    thr = np.array(POISSON1_CDF)

    def partial(t: pa.Table) -> pa.Table:
        ids = pc.cast(t[id_col], pa.string()).to_pylist()
        x = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        reps, sw, swx = [], [], []
        for r in range(n_reps):
            dg = content_digest([f"{seed}:{i}:{r}" for i in ids],
                                algo="md5")
            u = np.array([int(d[:16], 16) for d in dg],
                         dtype=np.float64) / 2.0 ** 64
            w = np.searchsorted(thr, u, side="right").astype(np.float64)
            reps.append(r)
            sw.append(float(w.sum()))
            swx.append(float((w * x).sum()))
        return pa.table({"rep": pa.array(reps, pa.int64()),
                         "sw": pa.array(sw, pa.float64()),
                         "swx": pa.array(swx, pa.float64())})

    part = ds.map_batches(partial, batch_format="pyarrow")

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"rep": pa.array([], pa.int64()),
                             "boot_mean": pa.array([], pa.float64())})
        g = t.group_by("rep").aggregate([("sw", "sum"), ("swx", "sum")])
        sw = g["sw_sum"].to_numpy(zero_copy_only=False)
        swx = g["swx_sum"].to_numpy(zero_copy_only=False)
        mean = np.where(sw > 0, swx / np.where(sw > 0, sw, 1.0), 0.0)
        return pa.table({"rep": g["rep"],
                         "boot_mean": pa.array(np.round(mean, 6),
                                               pa.float64())})

    from dedup_ray.util.exchange import hash_exchange

    return hash_exchange([part], ["rep"], fold, num_partitions=2)


def waterfill_allocation(counts_ds, key_col: str, count_col: str,
                         budget: int):
    """Water-filling per-domain token budget: find the single cap ``c``
    with ``Σ_d min(t_d, c) = budget`` and allocate ``min(t_d, c)`` to
    each domain — the standard anti-head-domain recipe step (cap the
    biggest crawl hosts, keep the tail whole) expressed in closed form.

    Input is an ALREADY-AGGREGATED (domain, count) table (domain-
    bounded, the usual census license); one single-partition reduce
    sorts it ascending and solves the piecewise-linear equation: with
    prefix sums ``P_k`` over ``t_(1..k)``, the cap in segment ``k`` is
    ``c = (budget − P_k) / (n − k)``, valid iff ``t_k ≤ c < t_(k+1)``
    — both engines derive ``c`` as ONE double division of exact
    integers, so the segment test can never disagree.  ``budget ≥ Σt``
    means no cap (every domain keeps its mass).  Output:
    ``(key_col, count_col, alloc)``, alloc at 6 dp.
    """
    out_fields = None  # resolved in the reduce from the input schema

    def reduce_fn(t: pa.Table) -> pa.Table:
        key_type = t.schema.field(key_col).type
        out_schema = pa.schema([(key_col, key_type),
                                (count_col, pa.int64()),
                                ("alloc", pa.float64())])
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas().sort_values([count_col, key_col],
                                       kind="mergesort")
        tv = df[count_col].to_numpy(dtype=np.int64)
        n, tot = len(tv), int(tv.sum())
        if budget >= tot:
            alloc = tv.astype(np.float64)
        else:
            pre = np.concatenate([[0], np.cumsum(tv)[:-1]])  # P_{k-1}
            # candidate cap if the cap lands at segment starting at k
            with np.errstate(divide="ignore"):
                cand = (budget - pre) / (n - np.arange(n))
            lo = np.concatenate([[-np.inf], tv[:-1].astype(np.float64)])
            valid = (cand >= lo) & (cand < tv)
            k = int(np.flatnonzero(valid)[0])
            c = float(cand[k])
            alloc = np.minimum(tv.astype(np.float64), c)
        return pa.table({
            key_col: pa.array(df[key_col].tolist(), key_type),
            count_col: pa.array(tv, pa.int64()),
            "alloc": pa.array(np.round(alloc, 6), pa.float64()),
        })

    from dedup_ray.util.exchange import exchange_group_apply

    return exchange_group_apply(
        counts_ds, [key_col], reduce_fn, num_partitions=1,
        empty_schema=pa.schema([(key_col, pa.string()),
                                (count_col, pa.int64())]),
    )


def temperature_weights(counts_ds, key_col: str, count_col: str,
                        alpha: float = 0.3):
    """Temperature-scaled sampling weights (the multilingual-corpus
    recipe, e.g. CC-100 / mT5: ``p_d ∝ t_d^α`` with α < 1 upweighting
    tail domains): one single-partition reduce over the domain-bounded
    count table emits ``(key, count, weight)`` with
    ``weight = t^α / Σ t^α`` at 6 dp — ``pow`` on exact integer inputs,
    same double on both engines."""
    def reduce_fn(t: pa.Table) -> pa.Table:
        key_type = t.schema.field(key_col).type
        out_schema = pa.schema([(key_col, key_type),
                                (count_col, pa.int64()),
                                ("weight", pa.float64())])
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas()
        tv = df[count_col].to_numpy(dtype=np.float64)
        w = tv ** alpha
        w = w / w.sum()
        return pa.table({
            key_col: pa.array(df[key_col].tolist(), key_type),
            count_col: pa.array(df[count_col].to_numpy(np.int64),
                                pa.int64()),
            "weight": pa.array(np.round(w, 6), pa.float64()),
        })

    from dedup_ray.util.exchange import exchange_group_apply

    return exchange_group_apply(
        counts_ds, [key_col], reduce_fn, num_partitions=1,
        empty_schema=pa.schema([(key_col, pa.string()),
                                (count_col, pa.int64())]),
    )


def quantile_normalize(ds, group_col: str = "source",
                       value_col: str = "n_chars",
                       id_col: str = "doc_id",
                       num_partitions: int = 16):
    """Cross-source quantile normalization (the microarray-era
    Bolstad et al. 2003 recipe applied to corpus curation): map each
    source's value distribution onto the POOLED distribution so
    per-source quality/length scores become comparable before mixing —
    source A's 90th percentile and source B's 90th percentile land on
    the same number regardless of how skewed each feed is.

    Exact, engine-portable semantics (no float percentiles): within a
    source, rank r = row_number ordered by (value, id) — unique, so no
    tie ambiguity; the global position is the INTEGER half-away
    rounding ``g = ((r−1)·(N−1)·2 + (n_s−1)) // (2·(n_s−1))`` (a
    single-doc source maps to the global median ``(N−1)//2``), and the
    normalized value is the pooled value at global rank g.  All
    arithmetic is int64 — exact while ``(n_s−1)·(N−1)·2 < 2^63``
    (beyond that, chunk the corpus or widen to object ints).

    Shuffle shape: ONE group-keyed exchange (each source ranks wholly
    in its partition); the rank→value lookup needs only the pooled
    VALUE HISTOGRAM (every doc at global rank g with the same value —
    the tie-break never changes the value), which is
    distinct-value-bounded driver state (the exact-quantile trade),
    broadcast to the ranking pass.

    Output: ``(id_col, group_col, value_col, qnorm)``.
    """
    import pandas as pd

    import ray

    from dedup_ray.util.exchange import exchange_group_apply

    hist = ds.groupby(value_col).count().to_pandas()
    if hist.empty:  # empty corpus: Ray drops columns at 0 rows
        import ray.data as _rd

        return _rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            group_col: pa.array([], pa.string()),
            value_col: pa.array([], pa.int64()),
            "qnorm": pa.array([], pa.int64())}))
    hist = hist.sort_values(value_col).reset_index(drop=True)
    vals = hist[value_col].to_numpy().astype(np.int64)
    cum = hist["count()"].to_numpy().astype(np.int64).cumsum()
    n_total = int(cum[-1]) if len(cum) else 0
    href = ray.put((vals, cum))

    out_schema = pa.schema([
        (id_col, pa.int64()), (group_col, pa.string()),
        (value_col, pa.int64()), ("qnorm", pa.int64()),
    ])

    def per_group(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        gvals, gcum = ray.get(href)
        df = t.to_pandas()
        out = []
        for _, sub in df.groupby(group_col, sort=False):
            x = sub[value_col].to_numpy().astype(np.int64)
            ids = sub[id_col].to_numpy().astype(np.int64)
            order = np.lexsort((ids, x))
            r = np.empty(len(x), np.int64)
            r[order] = np.arange(1, len(x) + 1)
            ns = len(x)
            if ns > 1:
                g = ((r - 1) * (n_total - 1) * 2 + (ns - 1)) \
                    // (2 * (ns - 1))
            else:
                g = np.full(1, (n_total - 1) // 2, np.int64)
            # value at pooled rank g: first index where cum > g
            qi = np.searchsorted(gcum, g, side="right")
            sub = sub.assign(qnorm=gvals[qi])
            out.append(sub)
        res = pd.concat(out)
        return pa.table({
            id_col: pa.array(res[id_col].to_numpy(), pa.int64()),
            group_col: pa.array(res[group_col], pa.string()),
            value_col: pa.array(res[value_col].to_numpy(), pa.int64()),
            "qnorm": pa.array(res["qnorm"].to_numpy(), pa.int64()),
        })

    return exchange_group_apply(
        ds.map_batches(
            lambda t: t.select([id_col, group_col, value_col]),
            batch_format="pyarrow"),
        [group_col], per_group, num_partitions,
        empty_schema=pa.schema([(id_col, pa.int64()),
                                (group_col, pa.string()),
                                (value_col, pa.int64())]),
    )
