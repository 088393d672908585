"""Deterministic global shuffle: a reproducible pseudo-random total order
over the corpus (the training-order shuffle of an LLM data pipeline).

A real 100-TB corpus cannot be shuffled by ``random_shuffle`` + collect —
and training runs need the ORDER to be reproducible across retries and
resumable mid-epoch.  The standard trick: order by a keyed hash of the
document id.  ``shuffle_rank`` assigns each doc its global position in
``md5(id:seed)`` order with the same two-level scan the sequence packer
uses (``stages/packing.py``): the first key byte forms 256 ordered coarse
buckets, bucket counts stream to the driver (256 rows), a cumsum gives
each bucket's global offset, and one exchange sorts within buckets.

md5 (not the engine's keyed BLAKE2b) is deliberate: the order is part of
the public spec — any engine, including the DuckDB oracle, can recompute
it from the id and seed alone.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from dedup_ray.util.hashing import content_digest


def _hex2_to_int(dg: list[str]) -> np.ndarray:
    """First hex byte of each digest → int, vectorized (no per-row int())."""
    u2 = np.array(dg, dtype="U2")  # truncates to first two chars
    codes = u2.view(np.uint32).reshape(len(dg), 2).astype(np.int64)
    vals = codes - 48 - 39 * (codes >= 97)  # '0'-'9' → 0-9, 'a'-'f' → 10-15
    return vals[:, 0] * 16 + vals[:, 1]


def token_budget_select(ds, budget: int, id_col: str = "doc_id",
                        score_col: str = "score", tokens_col: str = "n_tokens",
                        group_col: str | None = None):
    """Quality-ranked token-budget selection: keep documents in
    ``(score DESC, id ASC)`` order while the running token total stays
    ≤ ``budget`` — the "take the best B tokens" step of a pre-training
    data recipe, exactly ``SUM(tokens) OVER (ORDER BY score DESC, id)
    <= budget`` in SQL.

    With ``group_col`` the budget applies PER GROUP (the stratified
    recipe: "the best B tokens of every language"), = ``SUM(tokens)
    OVER (PARTITION BY group ORDER BY score DESC, id) <= budget``.
    Same sort-free plan — the per-score rollup keys on (group, score),
    the driver holds one cumsum per group, and ONE boundary pass
    collects every group's boundary score class.  Driver state is
    bounded by Σ_g (distinct scores + boundary class size), never the
    corpus.

    Sort-free distributed plan (a global sort of the corpus would be an
    all-to-all over every row; the selection needs none of it):

    1. one grouped sum → per-DISTINCT-SCORE ``(sum_tokens, n_docs)``
       rows stream to the driver — cardinality is bounded by the score
       domain (word counts, binned floats), not the corpus;
    2. driver cumsum over scores descending finds the boundary score
       ``s*`` where the budget crosses — every doc scoring above ``s*``
       is kept outright;
    3. ONLY the boundary group (docs with score == ``s*``) is collected
       (id, tokens), sorted by id, and cut where the remaining budget
       runs out.  Driver memory is one score-value group — the operator's
       documented skew bound (a float score makes it ~1 doc; a coarse
       integer score can make it large);
    4. the verdict ``(s*, cutoff id)`` broadcasts into one filter pass.

    Returns the kept rows ``(id_col, score_col, tokens_col)``.
    """
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Sum

    cols = [id_col, score_col, tokens_col]
    if group_col is not None:
        cols.insert(1, group_col)
    slim = ds.select_columns(cols)

    def typed_empty():
        sch = slim.schema()
        return ray.data.from_arrow(pa.table({
            n: pa.array([], t) for n, t in zip(sch.names, sch.types)
        }))

    if group_col is not None:
        return _grouped_budget_select(
            slim, budget, id_col, score_col, tokens_col, group_col,
            typed_empty,
        )

    per_score = slim.groupby(score_col).aggregate(
        Sum(tokens_col, alias_name="toks"),
    ).to_pandas()
    if per_score.empty or budget <= 0:
        return typed_empty()
    per_score = per_score.sort_values(score_col, ascending=False)
    cum = per_score["toks"].to_numpy().cumsum()
    crossing = np.flatnonzero(cum > budget)
    if len(crossing) == 0:  # whole corpus fits
        return slim
    bi = int(crossing[0])
    s_star = per_score[score_col].iloc[bi]
    spent = int(cum[bi - 1]) if bi > 0 else 0

    boundary = slim.map_batches(
        lambda t: t.filter(pc.equal(t[score_col], s_star))
                   .select([id_col, tokens_col]),
        batch_format="pyarrow",
    ).to_pandas()
    boundary = boundary.sort_values(id_col)
    fits = np.flatnonzero(
        spent + boundary[tokens_col].to_numpy().cumsum() > budget
    )
    n_fit = int(fits[0]) if len(fits) else len(boundary)
    cutoff_id = boundary[id_col].iloc[n_fit - 1] if n_fit > 0 else None
    if bi == 0 and cutoff_id is None:  # nothing above s*, nothing at it fits
        return typed_empty()

    def keep(t: pa.Table) -> pa.Table:
        above = pc.greater(t[score_col], s_star)
        if cutoff_id is None:
            return t.filter(above)
        at = pc.and_(pc.equal(t[score_col], s_star),
                     pc.less_equal(t[id_col], cutoff_id))
        return t.filter(pc.or_(above, at))

    return slim.map_batches(keep, batch_format="pyarrow")


def _grouped_budget_select(slim, budget, id_col, score_col, tokens_col,
                           group_col, typed_empty):
    """Per-group branch of :func:`token_budget_select` — one (group, score)
    rollup, driver cumsum per group, ONE boundary pass for all groups."""
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    if budget <= 0:
        return typed_empty()

    per = slim.groupby([group_col, score_col]).aggregate(
        Sum(tokens_col, alias_name="toks"),
    ).to_pandas()
    if per.empty:
        return typed_empty()
    per = per.sort_values([group_col, score_col], ascending=[True, False])
    cum = per.groupby(group_col, sort=False)["toks"].cumsum().to_numpy()
    over = cum > budget

    # first crossing row per group (groups with none fit whole)
    sstar_map: dict = {}   # group -> boundary score s*
    spent_map: dict = {}   # group -> tokens consumed above s*
    gvals = per[group_col].to_numpy()
    svals = per[score_col].to_numpy()
    for i in np.flatnonzero(over):
        g = gvals[i]
        if g in sstar_map:
            continue
        sstar_map[g] = svals[i]
        spent_map[g] = int(cum[i - 1]) if i > 0 and gvals[i - 1] == g else 0
    if not sstar_map:  # every group fits whole
        return slim

    def at_boundary(df: pd.DataFrame) -> pd.DataFrame:
        m = df[score_col] == df[group_col].map(sstar_map)
        return df.loc[m.fillna(False), [group_col, id_col, tokens_col]]

    boundary = slim.map_batches(at_boundary, batch_format="pandas").to_pandas()
    boundary = boundary.sort_values([group_col, id_col])
    cutoff_map: dict = {}  # group -> last id kept at s* (absent: none fit)
    for g, part in boundary.groupby(group_col, sort=False):
        fits = np.flatnonzero(
            spent_map[g] + part[tokens_col].to_numpy().cumsum() > budget
        )
        n_fit = int(fits[0]) if len(fits) else len(part)
        if n_fit > 0:
            cutoff_map[g] = part[id_col].iloc[n_fit - 1]

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        sst = df[group_col].map(sstar_map)
        above = sst.isna() | (df[score_col] > sst)
        cut = df[group_col].map(cutoff_map)
        at = (df[score_col] == sst) & cut.notna()
        if at.any():
            at.loc[at] = df.loc[at, id_col] <= cut[at]
        return df[above | at]

    return slim.map_batches(keep, batch_format="pandas")


def range_rank(ds, key_col: str, id_col: str, sample_rate: float = 0.05,
               seed: int = 7, num_partitions: int = 16):
    """Global ``ORDER BY (key, id)`` rank via sample-based range
    partitioning — the scalable alternative to a full ``ds.sort``
    (which re-sorts and merges every block through one all-to-all).

    Plan: (1) a DETERMINISTIC keyed-hash sample (md5(id:seed) hex-prefix
    threshold, the ``stages/mixing.py`` trick) streams ~``sample_rate``
    of the key values to the driver; its quantiles become the range-
    bucket boundaries.  (2) one exchange routes each row to its range
    bucket.  (3) tiny per-bucket counts (B rows) cumsum into exact
    global offsets, and each bucket sorts locally — rank = offset +
    local position.  Boundaries affect only LOAD BALANCE, never the
    output: ranks are exact for any boundary choice, so a skewed sample
    degrades a task's size, not correctness.  Driver state: the sample
    (``rate × n`` keys — pick rate so this is ~10⁵–10⁶ rows at scale)
    plus B counters.

    Output: ``(id_col, key_col, rank)`` with 0-based dense positions,
    ties broken by id.
    """
    import ray
    import ray.data

    from dedup_ray.util.exchange import exchange_group_apply

    slim = ds.select_columns([id_col, key_col])
    # Vectorized keyed-hash sample: boundaries only steer load balance
    # (ranks are exact for ANY boundary set), so the fast mix64 path is
    # used rather than the public-spec md5 — no oracle depends on which
    # rows were sampled.
    from dedup_ray.util.exchange import _key_hash
    from dedup_ray.util.hashing import mix64

    thresh = np.uint64(max(int(sample_rate * 2**64), 1))

    def sampled(t: pa.Table) -> pa.Table:
        h = mix64(_key_hash(t[id_col]).view(np.uint64)
                  ^ np.uint64(seed * 0x9E3779B97F4A7C15 % 2**64))
        keep = h < thresh
        return pa.table({key_col: t[key_col].filter(pa.array(keep))})

    sample_keys = np.sort(np.concatenate(
        [b[key_col].to_numpy(zero_copy_only=False)
         for b in slim.map_batches(sampled, batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow", batch_size=None)]
        or [np.array([])]
    ))
    if len(sample_keys):
        picks = np.unique(sample_keys[
            (np.linspace(0, 1, num_partitions + 1)[1:-1]
             * (len(sample_keys) - 1)).astype(np.int64)
        ])
    else:
        picks = np.array([])  # degenerate sample: one bucket, still exact

    def assign(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False)
        bkt = np.searchsorted(picks, keys, side="right").astype(np.int64)
        return t.append_column("bucket", pa.array(bkt))

    with_bkt = slim.map_batches(assign, batch_format="pyarrow").materialize()
    counts = with_bkt.groupby("bucket").count().to_pandas()
    if counts.empty:
        from dedup_ray.stages.packing import _schema_type

        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], _schema_type(with_bkt, id_col)),
            key_col: pa.array([], _schema_type(with_bkt, key_col)),
            "rank": pa.array([], pa.int64()),
        }))
    counts = counts.sort_values("bucket")
    buckets = counts["bucket"].to_numpy()
    offsets = np.r_[0, np.cumsum(counts["count()"].to_numpy())[:-1]]
    offset_ref = ray.put((buckets, offsets))

    def rank_part(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:  # exchange void blocks carry no schema
            id_t = part[id_col].type if id_col in part.column_names \
                else pa.int64()
            key_t = part[key_col].type if key_col in part.column_names \
                else pa.float64()
            return pa.table({
                id_col: pa.array([], id_t),
                key_col: pa.array([], key_t),
                "rank": pa.array([], pa.int64()),
            })
        bks, offs = ray.get(offset_ref)
        ids = part[id_col].to_numpy(zero_copy_only=False)
        keys = part[key_col].to_numpy(zero_copy_only=False)
        bkt = part["bucket"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, keys, bkt))
        bkt_s = bkt[order]
        first = np.r_[True, bkt_s[1:] != bkt_s[:-1]]
        local = np.arange(len(order), dtype=np.int64)
        base = np.repeat(local[first], np.diff(
            np.r_[np.flatnonzero(first), len(order)]
        ))
        rank = offs[np.searchsorted(bks, bkt_s)] + (local - base)
        return pa.table({
            id_col: pa.array(ids[order], part[id_col].type),
            key_col: pa.array(keys[order], part[key_col].type),
            "rank": pa.array(rank),
        })

    return exchange_group_apply(with_bkt, "bucket", rank_part,
                                num_partitions)


def shuffle_rank(ds, id_col: str = "doc_id", seed: int = 42,
                 num_partitions: int = 16):
    """Assign ``rank`` = global position of each row in ``md5(f"{id}:{seed}")``
    order (ties broken by id; 0-based).  Output: ``(id_col, rank)``."""
    import ray

    from dedup_ray.util.exchange import exchange_group_apply

    def keyed(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        dg = content_digest([f"{v}:{seed}" for v in ids], algo="md5")
        return pa.table({
            id_col: t[id_col],
            "skey": pa.array(dg, pa.string()),
            "bucket": pa.array(_hex2_to_int(dg)),
        })

    with_key = ds.map_batches(keyed, batch_format="pyarrow").materialize()

    counts = with_key.groupby("bucket").count().to_pandas()
    if counts.empty:  # empty corpus — keep the id TYPE
        import ray.data

        from dedup_ray.stages.packing import _schema_type

        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], _schema_type(with_key, id_col)),
            "rank": pa.array([], pa.int64()),
        }))
    counts = counts.sort_values("bucket")
    buckets = counts["bucket"].to_numpy()
    offsets = np.r_[0, np.cumsum(counts["count()"].to_numpy())[:-1]]
    offset_ref = ray.put((buckets, offsets))

    def rank_part(part: pa.Table) -> pa.Table:
        id_type = part[id_col].type if id_col in part.column_names \
            else pa.int64()
        if part.num_rows == 0:
            return pa.table({
                id_col: pa.array([], id_type),
                "rank": pa.array([], pa.int64()),
            })
        bks, offs = ray.get(offset_ref) \
            if not isinstance(offset_ref, tuple) else offset_ref
        ids = part[id_col].to_numpy(zero_copy_only=False)
        keys = np.asarray(part["skey"].to_pylist(), dtype=object)
        bkt = part["bucket"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, keys, bkt))
        bkt_s = bkt[order]
        first = np.r_[True, bkt_s[1:] != bkt_s[:-1]]
        local = np.arange(len(order), dtype=np.int64)
        base = np.repeat(local[first], np.diff(
            np.r_[np.flatnonzero(first), len(order)]
        ))
        rank = offs[np.searchsorted(bks, bkt_s)] + (local - base)
        return pa.table({
            id_col: pa.array(ids[order], id_type),
            "rank": pa.array(rank),
        })

    return exchange_group_apply(with_key, "bucket", rank_part,
                                num_partitions)


def group_percent_rank(ds, group_col: str, value_col: str, id_col: str,
                       num_partitions: int = 16, out_col: str = "pct_rank"):
    """Per-group ECDF / ``percent_rank()``: each row's quantile position
    ``(rank - 1) / (n - 1)`` within its group, ordered by
    ``(value, id)`` — the rank-normalization step that puts per-language
    quality scores on one comparable [0, 1] scale before a global
    threshold (CCNet-style per-bucket filtering).

    ONE exchange co-partitions on the group key; inside a partition a
    single lexsort + boundary scan ranks every group at once (no
    per-group Python).  Ids are unique, so the (value, id) order is
    total and rank == row_number — both engines divide the same int64
    operands, making the float column bit-identical to the SQL window
    function.  A singleton group gets 0.0, matching ``percent_rank``.
    Output: ``(id_col, group_col, value_col, out_col)``.
    """
    from dedup_ray.util.exchange import exchange_group_apply

    def per_part(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            g_t = part[group_col].type if group_col in part.column_names \
                else pa.string()
            i_t = part[id_col].type if id_col in part.column_names \
                else pa.int64()
            v_t = part[value_col].type if value_col in part.column_names \
                else pa.float64()
            return pa.table({
                id_col: pa.array([], i_t),
                group_col: pa.array([], g_t),
                value_col: pa.array([], v_t),
                out_col: pa.array([], pa.float64()),
            })
        g = np.asarray(part[group_col].to_pylist(), dtype=object)
        v = part[value_col].to_numpy(zero_copy_only=False)
        ids = part[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, v, g))
        g_s = g[order]
        new = np.r_[True, g_s[1:] != g_s[:-1]]
        grp = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        counts = np.diff(np.r_[starts, len(g_s)])
        rank = np.arange(len(g_s)) - starts[grp]
        denom = np.maximum(counts[grp] - 1, 1)
        pct = rank / denom
        sel = pa.array(order)
        return pa.table({
            id_col: part[id_col].take(sel),
            group_col: part[group_col].take(sel),
            value_col: part[value_col].take(sel),
            out_col: pa.array(pct, pa.float64()),
        })

    return exchange_group_apply(ds, group_col, per_part, num_partitions)


def interleave_by_key(ds, key_col: str, id_col: str,
                      num_partitions: int = 16):
    """Anti-clustering order: position rows so one key's rows are spread
    as far apart as possible — round-robin across keys, i.e. all the
    rank-0 rows of every key first, then every rank-1 row, and so on.
    The training-batch de-clumping step (consecutive same-host/source
    samples correlate gradients; crawl schedulers use the same shape for
    per-host politeness).

    Two exchange-free facts make this cheap: the within-key rank needs
    ONE exchange on the key (deterministic (md5(id), id) order inside a
    key, reusing the reproducible-shuffle idiom), and the final position
    is ``rank * K + key_index`` — a pure function of (rank, key_index)
    with K = number of distinct keys, so no global sort happens.  Key
    index = the key's rank in the sorted distinct-key list (bounded
    driver state: K keys).  Output: ``(id_col, key_col, pos)`` — ``pos``
    is a strict total order; gaps appear once keys exhaust (fewer rows
    than rank*K), which preserves spacing and is documented (a gapless
    variant would need a second scan).
    """
    from dedup_ray.util.exchange import exchange_group_apply
    from dedup_ray.util.hashing import content_digest

    keys = sorted(
        ds.select_columns([key_col]).unique(key_col)
    )
    key_ix = {k: i for i, k in enumerate(keys)}
    K = max(len(keys), 1)

    def per_key(part: pa.Table) -> pa.Table:
        if part.num_rows == 0 or key_col not in part.column_names:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                key_col: pa.array([], pa.string()),
                "pos": pa.array([], pa.int64()),
            })
        ids = part[id_col].to_numpy(zero_copy_only=False)
        kv = np.asarray(part[key_col].to_pylist(), dtype=object)
        dig = np.array(content_digest(
            [f"{v}:interleave" for v in ids.tolist()], algo="md5"))
        order = np.lexsort((ids, dig, kv))
        kv_s = kv[order]
        new = np.r_[True, kv_s[1:] != kv_s[:-1]]
        starts = np.flatnonzero(new)
        grp = np.cumsum(new) - 1
        rank = np.arange(len(kv_s)) - starts[grp]
        kix = np.array([key_ix[v] for v in kv_s], np.int64)
        pos = rank * K + kix
        sel = pa.array(order)
        return pa.table({
            id_col: part[id_col].take(sel),
            key_col: part[key_col].take(sel),
            "pos": pa.array(pos, pa.int64()),
        })

    return exchange_group_apply(ds, key_col, per_key, num_partitions)


def snm_pairs(ds, key_col: str, id_col: str, window: int = 4,
              num_partitions: int = 16):
    """Sorted-neighborhood blocking (Hernández & Stolfo 1995): candidate
    pairs are the rows within ``window`` positions of each other in the
    global ``(key, id)`` sort order — the classic record-linkage blocker
    next to LSH (sort key = a normalized name/date/price; near records
    sort near).  At 10^12 rows a sliding window over a global sort is
    the textbook sequential operator; here it distributes exactly:

    - global positions from :func:`range_rank` (sample-partitioned, no
      full sort all-to-all);
    - every row ships to bucket ``rank // window`` AND the next bucket
      (2× the narrow (rank, id) stream — ids only, never payloads);
    - one exchange on the bucket key; inside a bucket every pair
      ``(r1 < r2, r2 − r1 < window)`` is emitted iff ``r2``'s home
      bucket is this one — each pair materializes exactly once, with
      both members guaranteed co-located (``r1 ≥ r2 − window + 1`` ⇒
      ``r1``'s home is this bucket or the previous, and previous-bucket
      rows are present via their +1 copy).

    Output: ``(id1, id2)`` with ``id1`` the lower-ranked member.
    """
    from dedup_ray.util.exchange import exchange_group_apply

    ranked = range_rank(ds, key_col=key_col, id_col=id_col,
                        num_partitions=num_partitions)

    def fan_out(t: pa.Table) -> pa.Table:
        r = t["rank"].to_numpy(zero_copy_only=False)
        home = r // window
        ids = t[id_col]
        idx = pa.array(np.r_[np.arange(len(r)), np.arange(len(r))])
        return pa.table({
            "bucket": pa.array(np.r_[home, home + 1], pa.int64()),
            "home": pa.array(np.r_[home, home], pa.int64()),
            "rank": pa.array(np.r_[r, r], pa.int64()),
            id_col: ids.combine_chunks().take(idx)
            if isinstance(ids, pa.ChunkedArray) else ids.take(idx),
        })

    id_t = ds.schema().base_schema.field(id_col).type

    def per_part(part: pa.Table) -> pa.Table:
        empty = pa.table({"id1": pa.array([], id_t),
                          "id2": pa.array([], id_t)})
        if part.num_rows == 0 or "bucket" not in part.column_names:
            return empty
        df = part.to_pandas().sort_values(["bucket", "rank"],
                                          kind="stable")
        out1, out2 = [], []
        for b, sub in df.groupby("bucket", sort=False):
            r = sub["rank"].to_numpy()
            ids = sub[id_col].to_numpy()
            home = sub["home"].to_numpy()
            # small dense bucket (≤ 2·window rows): pairwise compare
            gap = r[None, :] - r[:, None]          # r2 − r1
            ok = (gap > 0) & (gap < window) & (home[None, :] == b)
            i1, i2 = np.nonzero(ok)
            out1.extend(ids[i1])
            out2.extend(ids[i2])
        if not out1:
            return empty
        return pa.table({"id1": pa.array(out1, id_t),
                         "id2": pa.array(out2, id_t)})

    fanned = ranked.map_batches(fan_out, batch_format="pyarrow")
    return exchange_group_apply(fanned, "bucket", per_part,
                                num_partitions)


def zorder_key(ds, cols: list, bits: int = 8, out_col: str = "zkey"):
    """Z-order (Morton) clustering key: interleave the low ``bits`` bits
    of each column so rows close in EVERY dimension get close keys —
    sort/partition output files by ``zkey`` and a range or point filter
    on ANY of the columns prunes most files (the Delta/Iceberg Z-ORDER
    layout primitive; min/max footer stats do the pruning at read time,
    ``pushdown_read_orders`` shows that half).

    Inputs must be non-negative ints below ``2^bits`` — quantize
    upstream (the caller knows the domain; silent rescaling here would
    hide a lossy step).  Values out of range raise.  Pure per-batch
    bit arithmetic: shuffle-free, vectorized, and exactly replayable as
    an unrolled SQL bit expression.
    """

    def f(t: pa.Table) -> pa.Table:
        z = np.zeros(t.num_rows, np.int64)
        for ci, c in enumerate(cols):
            v = t[c].to_numpy(zero_copy_only=False).astype(np.int64)
            if t.num_rows and (v.min() < 0 or v.max() >= (1 << bits)):
                raise ValueError(
                    f"zorder_key: {c} outside [0, 2^{bits})")
            for b in range(bits):
                z |= ((v >> b) & 1) << (b * len(cols) + ci)
        return t.append_column(out_col, pa.array(z, pa.int64()))

    return ds.map_batches(f, batch_format="pyarrow")


def zorder_sql_expr(cols: list, bits: int = 8) -> str:
    """DuckDB expression equal to :func:`zorder_key` — the same bit
    interleave unrolled (generated from the same constants)."""
    terms = []
    for ci, c in enumerate(cols):
        for b in range(bits):
            terms.append(f"((({c} >> {b}) & 1) << {b * len(cols) + ci})")
    return " | ".join(terms)


def watermark_late(ds, order_col: str, ts_col: str, delay_us: int,
                   num_partitions: int = 16, sample_rate: float = 0.05,
                   seed: int = 11):
    """Watermark / late-arrival accounting (the Dataflow-model bookkeeping
    of a streaming ingest): replaying the log in ``order_col`` arrival
    order, the watermark before each record is the running max event time
    over all STRICTLY earlier arrivals; a record is late when its event
    time trails the watermark by more than ``delay_us``.

    Distributed as a two-level prefix MAX (the ``range_rank`` plan):
    arrival order is range-partitioned into ordered buckets (sample-based
    boundaries steer only load balance — prefix maxima are exact for ANY
    split), each bucket computes its local running max, the driver folds
    B bucket maxima into exclusive offsets, and a second pass combines
    local prefix with bucket offset.  All comparisons are int64
    microseconds, so the SQL window-function oracle matches exactly.

    Output: (order_col, late BOOL, late_by_us INT64 — 0 when on time).
    """
    import ray

    from dedup_ray.util.exchange import _key_hash, exchange_group_apply
    from dedup_ray.util.hashing import mix64

    slim = ds.select_columns([order_col, ts_col])
    thresh = np.uint64(max(int(sample_rate * 2**64), 1))

    def sampled(t: pa.Table) -> pa.Table:
        h = mix64(_key_hash(t[order_col]).view(np.uint64)
                  ^ np.uint64(seed * 0x9E3779B97F4A7C15 % 2**64))
        return pa.table({order_col: t[order_col].filter(pa.array(h < thresh))})

    sample_keys = np.sort(np.concatenate(
        [b[order_col].to_numpy(zero_copy_only=False)
         for b in slim.map_batches(sampled, batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow", batch_size=None)]
        or [np.array([])]
    ))
    if len(sample_keys):
        picks = np.unique(sample_keys[
            (np.linspace(0, 1, num_partitions + 1)[1:-1]
             * (len(sample_keys) - 1)).astype(np.int64)
        ])
    else:
        picks = np.array([])

    def assign(t: pa.Table) -> pa.Table:
        keys = t[order_col].to_numpy(zero_copy_only=False)
        bkt = np.searchsorted(picks, keys, side="right").astype(np.int64)
        return pa.table({
            order_col: t[order_col],
            "__ts": pa.array(
                t[ts_col].cast(pa.timestamp("us")).to_numpy(
                    zero_copy_only=False).view(np.int64)),
            "bucket": pa.array(bkt),
        })

    with_bkt = slim.map_batches(assign, batch_format="pyarrow").materialize()
    bmax = with_bkt.groupby("bucket").max("__ts").to_pandas()
    if bmax.empty:
        import ray.data

        return ray.data.from_arrow(pa.table({
            order_col: pa.array([], pa.int64()),
            "late": pa.array([], pa.bool_()),
            "late_by_us": pa.array([], pa.int64()),
        }))
    bmax = bmax.sort_values("bucket")
    buckets = bmax["bucket"].to_numpy()
    maxes = bmax["max(__ts)"].to_numpy()
    # exclusive cummax: watermark entering each bucket from earlier buckets
    offsets = np.r_[np.iinfo(np.int64).min,
                    np.maximum.accumulate(maxes)[:-1]]
    offset_ref = ray.put((buckets, offsets))

    def late_part(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            o_t = part[order_col].type if order_col in part.column_names \
                else pa.int64()
            return pa.table({
                order_col: pa.array([], o_t),
                "late": pa.array([], pa.bool_()),
                "late_by_us": pa.array([], pa.int64()),
            })
        bks, offs = ray.get(offset_ref)
        order_v = part[order_col].to_numpy(zero_copy_only=False)
        ts = part["__ts"].to_numpy(zero_copy_only=False)
        bkt = part["bucket"].to_numpy(zero_copy_only=False)
        o = np.lexsort((order_v, bkt))
        ts_s, bkt_s = ts[o], bkt[o]
        # local EXCLUSIVE prefix max, restarting at each bucket boundary
        # (segments per partition = buckets per partition, a handful —
        # the loop is over segments, never rows)
        first = np.r_[True, bkt_s[1:] != bkt_s[:-1]]
        seg_start = np.flatnonzero(first)
        prev_in_seg = np.empty(len(ts_s), np.int64)
        lo = np.iinfo(np.int64).min
        for s, e in zip(seg_start, np.r_[seg_start[1:], len(ts_s)]):
            prev_in_seg[s:e] = np.r_[lo, np.maximum.accumulate(ts_s[s:e-1])] \
                if e > s + 1 else lo
        wm = np.maximum(prev_in_seg, offs[np.searchsorted(bks, bkt_s)])
        valid = wm > lo // 2  # a real watermark exists (some earlier row)
        wm_eff = np.where(valid, wm, ts_s)  # no watermark -> never late
        gap = wm_eff - np.int64(delay_us) - ts_s
        late = valid & (gap > 0)
        return pa.table({
            order_col: pa.array(order_v[o], part[order_col].type),
            "late": pa.array(late),
            "late_by_us": pa.array(np.where(late, gap, 0).astype(np.int64)),
        })

    return exchange_group_apply(with_bkt, "bucket", late_part,
                                num_partitions)


# ---------------------------------------------------------------------------
# Exact global order statistics by histogram bisection — no sort, no sketch
# ---------------------------------------------------------------------------

def exact_quantiles(ds, value_col: str, qs: list[float],
                    n_bins: int = 256, collect_limit: int = 65536,
                    num_partitions: int = 4) -> pa.Table:
    """EXACT q-quantiles (k-th smallest, k = 1 + floor(q·(n-1))) of a
    numeric column without a global sort and without sketch error.

    DDSketch (``stages/sketch.py``) answers the same question with a
    relative-error band; this is the exact path for when the number
    itself is load-bearing (billing cutoffs, SLO thresholds).  Classic
    distributed selection: each pass histograms the values of the
    current candidate interval into ``n_bins`` equal-width bins (one
    streaming ``map_batches`` + one tiny combine — per-batch state is
    ≤ |qs| × n_bins counts plus per-bin min/max), the driver descends
    into the bin containing the target rank, and when ≤
    ``collect_limit`` values remain in an interval they are pulled and
    selected exactly.  Bin boundaries are NEVER reused as filters —
    the next interval is the [min, max] of the chosen bin's actual
    values, so float-rounding at bin edges cannot misroute a value
    (the bin map is weakly monotone in v, which is all correctness
    needs).  Each pass shrinks the interval n_bins-fold: doubles are
    pinned in ≤ 8 passes over the value stream, all streaming.

    Ties are safe: ranks are defined over the multiset order.  Returns
    one row per q: ``(q, value)``, value rounded to 6 decimals.
    """
    import math

    import pyarrow.compute as pc

    from dedup_ray.util.exchange import hash_exchange

    def base_stats(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "mn": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64())})
        return pa.table({"n": pa.array([len(v)], pa.int64()),
                         "mn": pa.array([float(v.min())], pa.float64()),
                         "mx": pa.array([float(v.max())], pa.float64())})

    parts = ds.map_batches(base_stats, batch_format="pyarrow").take_all()
    n = int(sum(r["n"] for r in parts))
    if n == 0:
        return pa.table({"q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.float64())})
    lo0 = min(r["mn"] for r in parts)
    hi0 = max(r["mx"] for r in parts)

    # state per quantile: candidate interval + rank of target within it
    state = {}  # qi -> (lo, hi, rank_in_interval, count_in_interval)
    targets = {}
    for qi, q in enumerate(qs):
        k = 1 + math.floor(q * (n - 1))
        targets[qi] = k
        state[qi] = (lo0, hi0, k, n)

    def resolved(qi):
        lo, hi, _, cnt = state[qi]
        return lo == hi or cnt <= collect_limit

    for _ in range(12):
        active = [qi for qi in state if not resolved(qi)]
        if not active:
            break
        intervals = {qi: state[qi][:2] for qi in active}

        def hist_pass(t: pa.Table, iv=dict(intervals), nb=n_bins) -> pa.Table:
            v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
            rows_qi, rows_bin, rows_n = [], [], []
            rows_mn, rows_mx = [], []
            for qi, (lo, hi) in iv.items():
                m = (v >= lo) & (v <= hi)
                sub = v[m]
                if len(sub) == 0:
                    continue
                b = np.minimum(((sub - lo) / (hi - lo) * nb).astype(np.int64),
                               nb - 1)
                order = np.argsort(b, kind="stable")
                bs, ss = b[order], sub[order]
                uniq, starts = np.unique(bs, return_index=True)
                ends = np.append(starts[1:], len(bs))
                for u, s, e in zip(uniq, starts, ends):
                    rows_qi.append(qi)
                    rows_bin.append(int(u))
                    rows_n.append(int(e - s))
                    rows_mn.append(float(ss[s:e].min()))
                    rows_mx.append(float(ss[s:e].max()))
            return pa.table({"qi": pa.array(rows_qi, pa.int64()),
                             "bin": pa.array(rows_bin, pa.int64()),
                             "cnt": pa.array(rows_n, pa.int64()),
                             "mn": pa.array(rows_mn, pa.float64()),
                             "mx": pa.array(rows_mx, pa.float64())})

        hist = ds.map_batches(hist_pass, batch_format="pyarrow")

        def combine(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.schema([("qi", pa.int64()), ("bin", pa.int64()),
                                  ("cnt", pa.int64()), ("mn", pa.float64()),
                                  ("mx", pa.float64())]).empty_table()
            g = t.group_by(["qi", "bin"]).aggregate(
                [("cnt", "sum"), ("mn", "min"), ("mx", "max")])
            return g.rename_columns(["qi", "bin", "cnt", "mn", "mx"])  # keys first

        rows = hash_exchange([hist], [["qi", "bin"]], combine,
                             num_partitions=num_partitions).take_all()
        by_qi: dict[int, list] = {}
        for r in rows:
            by_qi.setdefault(r["qi"], []).append(r)
        for qi in active:
            lo, hi, rank, _ = state[qi]
            bins = sorted(by_qi.get(qi, []), key=lambda r: r["bin"])
            cum = 0
            for r in bins:
                if cum + r["cnt"] >= rank:
                    state[qi] = (r["mn"], r["mx"], rank - cum, r["cnt"])
                    break
                cum += r["cnt"]

    # ONE final filtered collect covering ALL unresolved intervals
    # (tagged by interval index, each bounded by collect_limit): the
    # per-interval pulls were separate plan launches — with 9 quantiles
    # that was up to 9 × ~0.4 s of fixed latency for 9 tiny scans.
    need = sorted({state[qi][:2] for qi in range(len(qs))
                   if state[qi][0] != state[qi][1]})
    pulls: dict[tuple, np.ndarray] = {}
    if need:
        ivs = list(enumerate(need))

        def pull(t: pa.Table, ivs=ivs) -> pa.Table:
            v = t[value_col].to_numpy(
                zero_copy_only=False).astype(np.float64)
            out_i, out_v = [], []
            for i, (lo, hi) in ivs:
                sub = v[(v >= lo) & (v <= hi)]
                out_i.append(np.full(len(sub), i, np.int64))
                out_v.append(sub)
            return pa.table({
                "i": pa.array(np.concatenate(out_i), pa.int64()),
                "v": pa.array(np.concatenate(out_v), pa.float64())})

        got = ds.map_batches(pull, batch_format="pyarrow").take_all()
        by_i: dict[int, list] = {}
        for r in got:
            by_i.setdefault(r["i"], []).append(r["v"])
        for i, key in ivs:
            pulls[key] = np.sort(np.array(by_i.get(i, []), np.float64))

    out_q, out_v = [], []
    for qi, q in enumerate(qs):
        lo, hi, rank, cnt = state[qi]
        val = lo if lo == hi else float(pulls[(lo, hi)][rank - 1])
        out_q.append(q)
        out_v.append(round(val, 6))
    return pa.table({"q": pa.array(out_q, pa.float64()),
                     "value": pa.array(out_v, pa.float64())})


# ---------------------------------------------------------------------------
# Hilbert-curve clustering key — the locality upgrade of zorder_key
# ---------------------------------------------------------------------------

def hilbert_key(ds, xcol: str, ycol: str, bits: int = 8,
                out_col: str = "hkey"):
    """2-D Hilbert curve index of (x, y): like ``zorder_key`` a
    space-filling clustering key for file layout, but with strictly
    better locality — the Hilbert walk never jumps (adjacent d are
    adjacent cells), so a rectangle query touches ~25% fewer runs than
    the Morton order at the same bit depth.  Inputs must be ints in
    ``[0, 2^bits)`` (quantize upstream, same contract as zorder_key).

    Classic per-bit rotate/reflect recurrence, vectorized over rows
    (the loop is over ``bits``, not rows); exactly replayable as an
    unrolled SQL CTE chain (:func:`hilbert_sql`)."""
    import pyarrow.compute as pc  # noqa: F401  (parity with siblings)

    def f(t: pa.Table) -> pa.Table:
        x = t[xcol].to_numpy(zero_copy_only=False).astype(np.int64).copy()
        y = t[ycol].to_numpy(zero_copy_only=False).astype(np.int64).copy()
        if t.num_rows and (
                min(x.min(), y.min()) < 0
                or max(x.max(), y.max()) >= (1 << bits)):
            raise ValueError(f"hilbert_key: input outside [0, 2^{bits})")
        d = np.zeros(t.num_rows, np.int64)
        s = 1 << (bits - 1)
        n_full = 1 << bits
        while s > 0:
            rx = ((x & s) > 0).astype(np.int64)
            ry = ((y & s) > 0).astype(np.int64)
            d += s * s * ((3 * rx) ^ ry)
            # rotate/reflect the quadrant so the sub-curve orients right.
            # Reflect over the FULL grid (n-1-x, the Wikipedia xy2d form),
            # not the subgrid (s-1-x): both give the same d (the consumed
            # high bits cancel) but n-1-x keeps every intermediate in
            # [0, 2^bits), which the SQL twin's // and % arithmetic needs
            # (negative intermediates would diverge between two's-complement
            # masking here and truncating division there).
            flip = (ry == 0) & (rx == 1)
            x[flip] = n_full - 1 - x[flip]
            y[flip] = n_full - 1 - y[flip]
            swap = ry == 0
            x[swap], y[swap] = y[swap], x[swap].copy()
            s >>= 1
        return t.append_column(out_col, pa.array(d, pa.int64()))

    return ds.map_batches(f, batch_format="pyarrow")


def hilbert_sql(select_cols: str, x_expr: str, y_expr: str, table: str,
                bits: int = 8, out_col: str = "hkey") -> str:
    """DuckDB query computing :func:`hilbert_key` — the same per-bit
    recurrence unrolled as one CTE per bit level (state columns x, y, d
    carried level to level; ``xor`` and integer ``//`` do the bit math)."""
    ctes = [
        f"r0 AS (SELECT {select_cols}, CAST({x_expr} AS BIGINT) AS x, "
        f"CAST({y_expr} AS BIGINT) AS y, CAST(0 AS BIGINT) AS d "
        f"FROM {table})"
    ]
    lvl = 0
    s = 1 << (bits - 1)
    while s > 0:
        lvl += 1
        # fresh nx/ny names so DuckDB's lateral SELECT-alias resolution can
        # never shadow the previous level's x inside the y expression
        ctes.append(
            f"r{lvl} AS (SELECT {select_cols}, nx AS x, ny AS y, nd AS d "
            f"FROM (SELECT {select_cols}, "
            f"CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 "
            f"THEN {(1 << bits) - 1} - y ELSE y END) ELSE x END AS nx, "
            f"CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 "
            f"THEN {(1 << bits) - 1} - x ELSE x END) ELSE y END AS ny, "
            f"d + {s * s} * xor(3 * rx, ry) AS nd FROM ("
            f"SELECT *, (x // {s}) % 2 AS rx, (y // {s}) % 2 AS ry "
            f"FROM r{lvl - 1})))"
        )
        s >>= 1
    return (f"WITH {', '.join(ctes)} "
            f"SELECT {select_cols}, d AS {out_col} FROM r{lvl}")


def ntile_bucket(ds, key_col: str, id_col: str, n_buckets: int,
                 num_partitions: int = 16):
    """Equi-depth (ntile) binning over the global ``ORDER BY (key, id)``
    order — the discretization step ahead of stratified policies
    (per-quality-decile sampling rates, histogram equalization).

    Built on :func:`range_rank`, so there is NO full-table sort: one
    sample pass for range boundaries + one bucket exchange.  The bucket
    is then a pure function of (rank, total count) using the standard
    SQL ``NTILE`` remainder rule — the first ``count % n`` buckets get
    one extra row — so the output equals the window function exactly,
    at any partitioning.

    Output: ``(id_col, key_col, rank, bucket)`` with 1-based buckets.
    """
    ranked = range_rank(ds, key_col, id_col,
                        num_partitions=num_partitions).materialize()
    total = ranked.count()
    q, rem = divmod(total, n_buckets)

    def add_bucket(t: pa.Table) -> pa.Table:
        r = t["rank"].to_numpy(zero_copy_only=False)
        if q == 0:
            b = r + 1
        else:
            cut = rem * (q + 1)
            b = np.where(r < cut, r // (q + 1), rem + (r - cut) // q) + 1
        return t.append_column("bucket", pa.array(b.astype(np.int64)))

    return ranked.map_batches(add_bucket, batch_format="pyarrow")
