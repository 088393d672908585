"""DSIR-style data selection: hashed-n-gram importance weights.

Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): score every raw document by the log-likelihood ratio
of its hashed token features under a TARGET distribution (a sample of
the domain you want more of) versus the RAW corpus distribution, then
sample proportionally to the importance weight.  The standard recipe for
"make my web corpus look more like Wikipedia/books" at 100-TB scale —
two bounded counting passes and one broadcast, no shuffle at all.

Shape:

1. **Distribution passes** (one over the target sample, one over the
   corpus): per-batch token→bucket histograms (md5-prefix buckets so the
   DuckDB twin can rebuild them; md5 runs over dictionary-encoded distinct tokens only)
   stream to the driver as nonzero ``(bucket, cnt)`` partials — driver
   state is the ``n_buckets`` histogram, fixed, never corpus-sized.
2. **Score pass**: the smoothed log-ratio array broadcasts via
   ``ray.put``; each doc's score is the sum of ``ratio[bucket]`` over
   its tokens, vectorized by ``np.bincount`` scatter.  Rounded to 6
   decimals so cross-engine sum association cannot flip the comparison.

Compose with :func:`dedup_ray.stages.mixing.weighted_sample` (A-ES) on
``exp(clip(llr))`` for the actual resampling step; the score table is
the checkable intermediate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from dedup_ray.util.hashing import content_digest

DSIR_BUCKETS = 4096  # 16^3: bucket = first 3 hex digits of md5(token)


def _flat_token_buckets(t: pa.Table, text_col: str):
    """Per-token (bucket, parent-row) arrays for one batch.

    Tokens stay in Arrow until ``dictionary_encode`` — only the batch's
    DISTINCT tokens are boxed for md5 (vocab-bounded, not
    occurrence-bounded); bucket ids scatter back through the dictionary
    indices."""
    txt = t[text_col]
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    txt = pc.coalesce(txt, pa.scalar("", txt.type))
    toks = pc.split_pattern(txt, " ")
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    if len(flat) == 0:
        return np.zeros(0, np.int64), parents
    de = flat.dictionary_encode()
    vocab = de.dictionary.to_pylist()
    digs = content_digest(vocab, algo="md5")
    ub = np.array([int(d[:3], 16) for d in digs], np.int64)
    idx = de.indices.to_numpy(zero_copy_only=False)
    return ub[idx], parents


def _bucket_histogram(ds, text_col: str) -> np.ndarray:
    """Streamed bucket histogram: driver holds n_buckets ints, ever."""
    def partial(t: pa.Table) -> pa.Table:
        buckets, _ = _flat_token_buckets(t, text_col)
        if not len(buckets):
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        counts = np.bincount(buckets, minlength=DSIR_BUCKETS)
        nz = np.flatnonzero(counts)
        return pa.table({"bucket": pa.array(nz.astype(np.int64)),
                         "cnt": pa.array(counts[nz].astype(np.int64))})

    hist = np.zeros(DSIR_BUCKETS, np.int64)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=65536
    ):
        np.add.at(hist, b["bucket"].to_numpy(zero_copy_only=False),
                  b["cnt"].to_numpy(zero_copy_only=False))
    return hist


def dsir_logratio(corpus_ds, target_ds, id_col: str = "doc_id",
                  text_col: str = "text", smoothing: float = 1.0):
    """Per-doc DSIR importance score over ``corpus_ds``:
    ``llr(x) = Σ_tokens ln(p_target[bucket] / p_raw[bucket])`` with
    add-``smoothing`` bucket probabilities.  Returns ``(id_col, llr)``.
    """
    import ray

    tgt = _bucket_histogram(target_ds, text_col)
    raw = _bucket_histogram(corpus_ds, text_col)
    b = DSIR_BUCKETS
    ratio = (
        np.log((tgt + smoothing) / (tgt.sum() + smoothing * b))
        - np.log((raw + smoothing) / (raw.sum() + smoothing * b))
    )
    ref = ray.put(ratio)

    def score(t: pa.Table) -> pa.Table:
        r = ray.get(ref)
        buckets, parents = _flat_token_buckets(t, text_col)
        s = np.zeros(t.num_rows, np.float64)
        if len(buckets):
            np.add.at(s, parents, r[buckets])
        return pa.table({
            id_col: t[id_col],
            "llr": pa.array(np.round(s, 6), pa.float64()),
        })

    return corpus_ds.map_batches(score, batch_format="pyarrow")


def unigram_perplexity(ds, id_col: str = "doc_id", text_col: str = "text",
                       smoothing: float = 1.0):
    """Hashed-unigram LM perplexity — the CCNet quality signal (Wenzek
    et al. 2020 score docs with a wiki-trained KenLM; this is the
    training-free self-scored analog over the md5 bucket space DSIR
    already uses): fit add-``smoothing`` bucket probabilities in ONE
    driver-bounded histogram pass (4096 ints), then one broadcast pass
    emits each document's mean negative log probability and
    ``ppl = exp(nll)``.  Low-perplexity docs look like the corpus' bulk;
    high-perplexity docs are gibberish/outliers — both tails are the
    standard filter targets.  Zero shuffles at any corpus size.

    Tokenization follows the DSIR convention (split on single space, no
    empty-token filter — an empty page scores as one OOV-ish token), so
    the SQL twin replays buckets and formula exactly.  ``nll`` rounds at
    6dp and ``ppl`` is ``exp`` of the ROUNDED nll (rounded 3dp): the
    exp amplifies sum-association noise, so both engines exponentiate
    the identical 6dp value.
    """
    import ray

    hist = _bucket_histogram(ds, text_col)
    b = DSIR_BUCKETS
    neg_logp = -np.log((hist + smoothing) / (hist.sum() + smoothing * b))
    ref = ray.put(neg_logp)

    def score(t: pa.Table) -> pa.Table:
        nl = ray.get(ref)
        buckets, parents = _flat_token_buckets(t, text_col)
        s = np.zeros(t.num_rows, np.float64)
        if len(buckets):
            np.add.at(s, parents, nl[buckets])
        n = np.bincount(parents, minlength=t.num_rows).astype(np.int64)
        nll = np.round(s / np.maximum(n, 1), 6)
        return pa.table({
            id_col: t[id_col],
            "n_tokens": pa.array(n),
            "nll": pa.array(nll, pa.float64()),
            "ppl": pa.array(np.round(np.exp(nll), 3), pa.float64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def bigram_backoff_score(ds, id_col: str = "doc_id", text_col: str = "text",
                         alpha: float = 0.4, min_count: int = 2,
                         num_partitions: int = 16):
    """Stupid-backoff bigram LM score per document (Brants et al., EMNLP
    2007 — the web-scale LM smoothing that made KenLM-style corpus
    scoring tractable): for each in-doc bigram (w1, w2),

        s = count(w1 w2) / count(w1)          if count(w1 w2) ≥ min_count
        s = alpha · count(w2) / total_tokens  otherwise (backoff)

    and the doc score is the mean ln s over its bigrams — the bigram
    upgrade of :func:`unigram_perplexity` / ``token_logfreq_score``.
    ``min_count`` prunes the bigram table exactly as a production LM
    does (a web-scale bigram table is only vocab²-bounded AFTER count
    pruning); the pruned mass is what exercises the backoff path when
    the corpus scores itself.

    Distributed shape — counts are co-partitioned joins, never broadcast
    (web-scale vocab is unbounded): one text pass builds bigram rows
    keyed ``w1 || chr(31) || w2`` (the join-key law shared verbatim with
    the SQL twin, so tokens containing the separator alias identically
    in both engines); bigram counts and unigram counts are narrow
    grouped tables; three ``exchange_join`` hops attach c2 / c1(w1) /
    c1(w2); the per-doc Σ ln s partial is grouped once.  Docs with < 2
    tokens emit ``n_bigrams = 0`` and a null score.  Only
    ``total_tokens`` (one integer) reaches the driver.

    Output: ``(id_col, n_bigrams, bigram_lp)`` with ``bigram_lp``
    rounded to 6dp.
    """
    from dedup_ray.util.exchange import exchange_join

    def bigrams(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        texts = t[text_col].to_pylist()
        out_id, w1s, w2s = [], [], []
        for i, txt in enumerate(texts):
            ws = (txt or "").split(" ")
            if len(ws) < 2:
                continue
            out_id.extend([ids[i]] * (len(ws) - 1))
            w1s.extend(ws[:-1])
            w2s.extend(ws[1:])
        w1a = pa.array(w1s, pa.string())
        w2a = pa.array(w2s, pa.string())
        k12 = pc.binary_join_element_wise(w1a, w2a, "\x1f")
        return pa.table({
            id_col: pa.array(out_id, pa.int64()),
            "w1": w1a, "w2": w2a, "k12": k12,
        })

    big = ds.map_batches(bigrams, batch_format="pyarrow").materialize()

    def toks(t: pa.Table) -> pa.Table:
        txt = t[text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        txt = pc.coalesce(txt, pa.scalar("", pa.string()))
        flat = pc.list_flatten(pc.split_pattern(txt, " "))
        return pa.table({"w": flat})

    tok_ds = ds.map_batches(toks, batch_format="pyarrow").materialize()
    total = tok_ds.count()

    def rn(cols):
        def f(t: pa.Table) -> pa.Table:
            return t.rename_columns(cols)
        return f

    uni = tok_ds.groupby("w").count().map_batches(
        rn(["w", "c1"]), batch_format="pyarrow")
    c2 = big.groupby("k12").count().map_batches(
        rn(["k12", "c2"]), batch_format="pyarrow").filter(
        lambda r: r["c2"] >= min_count)

    j1 = exchange_join(
        big, c2, on="k12", how="left", num_partitions=num_partitions,
        empty_schema=pa.schema([
            (id_col, pa.int64()), ("w1", pa.string()), ("w2", pa.string()),
            ("k12", pa.string()), ("c2", pa.int64()),
        ]),
        return_refs=True,
    )
    uni1 = uni.map_batches(rn(["w1", "c1w1"]), batch_format="pyarrow")
    j2 = exchange_join(
        j1, uni1, on="w1", how="inner", num_partitions=num_partitions,
        empty_schema=pa.schema([
            (id_col, pa.int64()), ("w2", pa.string()), ("k12", pa.string()),
            ("c2", pa.int64()), ("c1w1", pa.int64()),
        ]),
        return_refs=True,
    )
    uni2 = uni.map_batches(rn(["w2", "c1w2"]), batch_format="pyarrow")

    def score_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        c2v = t["c2"].to_numpy(zero_copy_only=False).astype(np.float64)
        c1w1 = t["c1w1"].to_numpy(zero_copy_only=False).astype(np.float64)
        c1w2 = t["c1w2"].to_numpy(zero_copy_only=False).astype(np.float64)
        seen = ~np.isnan(c2v)
        s = np.where(seen,
                     np.log(np.where(seen, c2v, 1.0) / c1w1),
                     np.log(alpha * c1w2 / total))
        g = pa.table({id_col: t[id_col], "s": pa.array(s, pa.float64())})
        agg = g.group_by(id_col).aggregate([("s", "sum"), ("s", "count")])
        return agg.rename_columns([id_col, "s", "n"])

    j3 = exchange_join(
        j2, uni2, on="w2", how="inner", num_partitions=num_partitions,
        empty_schema=pa.schema([
            (id_col, pa.int64()), ("s", pa.float64()), ("n", pa.int64()),
        ]),
        post=score_partial,
        return_refs=True,
    )

    def finish(lf: pa.Table, rf: pa.Table) -> pa.Table:
        ids = lf[id_col] if id_col in lf.column_names \
            else pa.array([], pa.int64())
        left = pa.table({id_col: ids})
        if "s" not in rf.column_names:
            rf = pa.table({id_col: pa.array([], pa.int64()),
                           "s": pa.array([], pa.float64()),
                           "n": pa.array([], pa.int64())})
        part = rf.group_by(id_col).aggregate([("s", "sum"), ("n", "sum")])
        part = part.rename_columns([id_col, "s", "n"])
        j = left.join(part, keys=id_col, join_type="left outer")
        n = j["n"].to_numpy(zero_copy_only=False)
        s = j["s"].to_numpy(zero_copy_only=False)
        nn = np.nan_to_num(n.astype(np.float64), nan=0.0)
        lp = np.where(nn > 0, np.round(s / np.maximum(nn, 1.0), 6), np.nan)
        return pa.table({
            id_col: j[id_col],
            "n_bigrams": pa.array(nn.astype(np.int64)),
            "bigram_lp": pa.array(
                [None if not (x == x) else float(x) for x in lp],
                pa.float64()),
        })

    from dedup_ray.util.exchange import hash_exchange

    doc_ids = ds.map_batches(
        lambda t: t.select([id_col]), batch_format="pyarrow")
    return hash_exchange(
        [doc_ids, j3], [id_col, id_col], finish,
        num_partitions=num_partitions,
    )



def kneser_ney_score(ds, id_col: str = "doc_id", text_col: str = "text",
                     discount: float = 0.75, num_partitions: int = 16):
    """Interpolated Kneser-Ney bigram LM score per document (Kneser &
    Ney 1995; Chen & Goodman 1998's interpolated form) — the smoothing
    the CCNet/KenLM perplexity-filter recipe actually ships, next to
    :func:`bigram_backoff_score`'s cruder stupid-backoff:

        P(w|v) = max(c(vw) - D, 0) / c(v·)
               + D · N1+(v·) / c(v·) · ( N1+(·w) / N1+(··) )

    where c(v·) is v's bigram-context count, N1+(v·) its distinct-
    successor count, N1+(·w) the CONTINUATION count (how many contexts
    w completes — the famous "San Francisco" correction: frequent but
    context-locked words get small continuation mass), and N1+(··) the
    total bigram-type count.  The corpus scores itself, so every in-doc
    bigram has c(vw) >= 1 > D and the max() never clips.

    Distributed shape mirrors :func:`bigram_backoff_score` — counts are
    co-partitioned joins, never a broadcast vocab (web-scale vocab is
    unbounded): one text pass emits bigram rows; c(vw) groups on the
    packed key, (c(v·), N1+(v·)) group on w1, N1+(·w) groups on w2
    (Arrow count_distinct inside the partition — every w1 lands whole);
    three ``exchange_join`` hops attach them; the per-doc Σ ln P
    partial rides the last join's reduce.  Exactly ONE scalar (the
    bigram-type count N1+(··)) reaches the driver.  Docs with < 2
    tokens emit ``n_bigrams = 0`` and a null score.

    Output: ``(id_col, n_bigrams, kn_lp)``, ``kn_lp`` = mean ln P
    rounded 6dp.
    """
    from dedup_ray.util.exchange import exchange_join, exchange_group_apply

    def bigrams(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        texts = t[text_col].to_pylist()
        out_id, w1s, w2s = [], [], []
        for i, txt in enumerate(texts):
            ws = (txt or "").split(" ")
            if len(ws) < 2:
                continue
            out_id.extend([ids[i]] * (len(ws) - 1))
            w1s.extend(ws[:-1])
            w2s.extend(ws[1:])
        w1a = pa.array(w1s, pa.string())
        w2a = pa.array(w2s, pa.string())
        k12 = pc.binary_join_element_wise(w1a, w2a, "\x1f")
        return pa.table({
            id_col: pa.array(out_id, pa.int64()),
            "w1": w1a, "w2": w2a, "k12": k12,
        })

    big = ds.map_batches(bigrams, batch_format="pyarrow").materialize()

    def rn(cols):
        def f(t: pa.Table) -> pa.Table:
            return t.rename_columns(cols)
        return f

    c2 = big.groupby("k12").count().map_batches(
        rn(["k12", "c2"]), batch_format="pyarrow").materialize()
    n_bigram_types = c2.count()  # N1+(··) — the one driver scalar

    def ctx_agg(t: pa.Table) -> pa.Table:
        g = t.group_by("w1").aggregate([("k12", "count"),
                                        ("w2", "count_distinct")])
        return g.rename_columns(["w1", "c1v", "n1v"])

    ctx = exchange_group_apply(
        big.select_columns(["w1", "w2", "k12"]), ["w1"], ctx_agg,
        num_partitions,
        empty_schema=pa.schema([("w1", pa.string()), ("w2", pa.string()),
                                ("k12", pa.string())]),
    )

    def cont_agg(t: pa.Table) -> pa.Table:
        g = t.group_by("w2").aggregate([("w1", "count_distinct")])
        return g.rename_columns(["w2", "n1w"])

    cont = exchange_group_apply(
        big.select_columns(["w1", "w2"]), ["w2"], cont_agg,
        num_partitions,
        empty_schema=pa.schema([("w1", pa.string()), ("w2", pa.string())]),
    )

    j1 = exchange_join(
        big, c2, on="k12", how="inner", num_partitions=num_partitions,
        empty_schema=pa.schema([
            (id_col, pa.int64()), ("w1", pa.string()), ("w2", pa.string()),
            ("k12", pa.string()), ("c2", pa.int64()),
        ]),
        return_refs=True,
    )
    j2 = exchange_join(
        j1, ctx, on="w1", how="inner", num_partitions=num_partitions,
        empty_schema=pa.schema([
            (id_col, pa.int64()), ("w2", pa.string()), ("k12", pa.string()),
            ("c2", pa.int64()), ("c1v", pa.int64()), ("n1v", pa.int64()),
        ]),
        return_refs=True,
    )

    D = discount
    B = float(n_bigram_types) if n_bigram_types else 1.0

    def score_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        c2v = t["c2"].to_numpy(zero_copy_only=False).astype(np.float64)
        c1v = t["c1v"].to_numpy(zero_copy_only=False).astype(np.float64)
        n1v = t["n1v"].to_numpy(zero_copy_only=False).astype(np.float64)
        n1w = t["n1w"].to_numpy(zero_copy_only=False).astype(np.float64)
        # association mirrors the SQL twin token-for-token
        s = np.log((c2v - D) / c1v + D * n1v / c1v * (n1w / B))
        g = pa.table({id_col: t[id_col], "s": pa.array(s, pa.float64())})
        agg = g.group_by(id_col).aggregate([("s", "sum"), ("s", "count")])
        return agg.rename_columns([id_col, "s", "n"])

    j3 = exchange_join(
        j2, cont, on="w2", how="inner", num_partitions=num_partitions,
        empty_schema=pa.schema([
            (id_col, pa.int64()), ("s", pa.float64()), ("n", pa.int64()),
        ]),
        post=score_partial,
        return_refs=True,
    )

    def finish(lf: pa.Table, rf: pa.Table) -> pa.Table:
        ids = lf[id_col] if id_col in lf.column_names \
            else pa.array([], pa.int64())
        left = pa.table({id_col: ids})
        if "s" not in rf.column_names:
            rf = pa.table({id_col: pa.array([], pa.int64()),
                           "s": pa.array([], pa.float64()),
                           "n": pa.array([], pa.int64())})
        part = rf.group_by(id_col).aggregate([("s", "sum"), ("n", "sum")])
        part = part.rename_columns([id_col, "s", "n"])
        j = left.join(part, keys=id_col, join_type="left outer")
        n = j["n"].to_numpy(zero_copy_only=False)
        s = j["s"].to_numpy(zero_copy_only=False)
        nn = np.nan_to_num(n.astype(np.float64), nan=0.0)
        lp = np.where(nn > 0, np.round(s / np.maximum(nn, 1.0), 6), np.nan)
        return pa.table({
            id_col: j[id_col],
            "n_bigrams": pa.array(nn.astype(np.int64)),
            "kn_lp": pa.array(
                [None if not (x == x) else float(x) for x in lp],
                pa.float64()),
        })

    from dedup_ray.util.exchange import hash_exchange

    doc_ids = ds.map_batches(
        lambda t: t.select([id_col]), batch_format="pyarrow")
    return hash_exchange(
        [doc_ids, j3], [id_col, id_col], finish,
        num_partitions=num_partitions,
    )

def kcenter_select(ds, k: int = 8, id_col: str = "vec_id",
                   vec_col: str = "embedding"):
    """Greedy k-center / farthest-point coreset selection (Gonzalez 1985;
    the coreset recipe behind active-learning and data-pruning selection,
    e.g. Sener & Savarese 2018): seed with the smallest id, then ``k−1``
    rounds of "add the point farthest from the selected set".

    Distributed shape: centers live on the driver (≤ k×d floats — the
    ONLY driver state); each round broadcasts them via ``ray.put`` and
    one ``map_batches`` pass emits a single per-batch champion
    ``(id, dist)`` row; the driver reduces ≤ n_blocks rows to the global
    argmax (ties → smallest id).  As written each round recomputes
    min-distance against all current centers (O(n·k·d) total, matching
    the SQL twin term for term); the production path carries a running
    min-dist column between rounds instead (O(n·d) per round) —
    same selections, one materialized column of extra state.

    Distances are Euclidean over the float32 vectors cast to float64
    (the oracle's ``list_distance(CAST(v AS DOUBLE[]))`` law).  Output:
    ``(rank, vec_id, dist)`` — dist = distance to the prior selected set
    at selection time (seed row: 0.0), rounded to 6dp.
    """
    import ray

    # seed: smallest id (tiny driver fetch of one row)
    seed_id = ds.min(id_col)
    seed_row = ds.filter(lambda r: r[id_col] == seed_id).take(1)[0]
    centers = [np.asarray(seed_row[vec_col], dtype=np.float64)]
    sel_ids = [int(seed_id)]
    out_rank, out_id, out_dist = [0], [int(seed_id)], [0.0]

    for _ in range(1, k):
        cref = ray.put(np.stack(centers))
        sref = ray.put(np.array(sel_ids, dtype=np.int64))

        def champion(t: pa.Table, _c=cref, _s=sref) -> pa.Table:
            c = ray.get(_c)
            taken = ray.get(_s)
            empty = pa.table({
                "cid": pa.array([], pa.int64()),
                "cdist": pa.array([], pa.float64()),
                "cvec": pa.array([], pa.list_(pa.float64())),
            })
            if t.num_rows == 0:
                return empty
            ids = t[id_col].to_numpy(zero_copy_only=False)
            x = np.stack(
                [np.asarray(v, dtype=np.float64)
                 for v in t[vec_col].to_pylist()]
            )
            keep = ~np.isin(ids, taken)
            if not keep.any():
                return empty
            ids, x = ids[keep], x[keep]
            d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            dist = np.sqrt(d2.min(axis=1))
            # per-batch champion: max dist, tie -> smallest id
            best = np.lexsort((ids, -dist))[0]
            return pa.table({
                "cid": pa.array([ids[best]], pa.int64()),
                "cdist": pa.array([dist[best]], pa.float64()),
                "cvec": pa.array([x[best].tolist()],
                                 pa.list_(pa.float64())),
            })

        parts = ds.map_batches(champion, batch_format="pyarrow").take_all()
        best = max(parts, key=lambda r: (r["cdist"], -r["cid"]))
        bid = int(best["cid"])
        centers.append(np.asarray(best["cvec"], dtype=np.float64))
        sel_ids.append(bid)
        out_rank.append(len(sel_ids) - 1)
        out_id.append(bid)
        out_dist.append(round(float(best["cdist"]), 6))

    return pa.table({
        "rank": pa.array(out_rank, pa.int64()),
        "vec_id": pa.array(out_id, pa.int64()),
        "dist": pa.array(out_dist, pa.float64()),
    })


def facility_location_select(ds, k: int = 8, pool: int = 64,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding"):
    """Greedy facility-location coreset (Nemhauser et al. 1978's
    (1-1/e) greedy on the submodular coverage objective
    ``F(S) = Σ_i max_{j∈S} max(0, cos(i, j))``) — the DIVERSITY
    selection that maximizes how well the chosen set covers the corpus,
    next to :func:`kcenter_select`'s max-min radius objective (coverage
    picks dense-cluster representatives; k-center picks extremes).

    Distributed shape: candidates come from a bounded POOL (ids BELOW
    ``pool`` — a dense-id assumption; at web scale the pool is cluster
    reps or a seeded sample, and a sparse-id corpus should pass its own
    candidate filter; greedy FL over an unbounded candidate set is
    inherently quadratic) broadcast once with the growing selection;
    each round is ONE ``map_batches`` pass emitting per-candidate
    partial coverage sums ``Σ_i max(cur_i, s_ip)``, with the per-item
    state ``cur_i`` RECOMPUTED from the broadcast selection (max-chains
    are selection-only ops, bit-equal in any engine — the same
    recompute-over-state trade as ``stages/topics.py``).  The driver
    folds P partials and argmaxes the 6dp-rounded gain (ties → smaller
    id).  Returns one row per round: ``(round, sel_id, coverage)``
    with coverage = Σ cur after the pick, rounded 6dp.
    """
    import ray

    import ray.data as _rd

    pdf = ds.map_batches(
        lambda t: t.filter(pc.less(t[id_col], pa.scalar(pool))),
        batch_format="pyarrow").to_pandas()
    if pdf.empty:  # empty pool/corpus: Ray drops columns at 0 rows
        return _rd.from_arrow(pa.table({
            "round": pa.array([], pa.int64()),
            "sel_id": pa.array([], pa.int64()),
            "coverage": pa.array([], pa.float64())}))
    pdf = pdf.sort_values(id_col)
    pool_ids = pdf[id_col].tolist()
    pv = np.asarray([list(v) for v in pdf[vec_col]], dtype=np.float64)
    pn = np.linalg.norm(pv, axis=1, keepdims=True)
    pn[pn == 0] = 1.0
    pv = pv / pn

    selected: list[int] = []
    rows = []
    for _ in range(min(k, len(pool_ids))):
        ref = ray.put((pv, [pool_ids.index(s) for s in selected]))

        def partial(t: pa.Table, _r=ref) -> pa.Table:
            pvm, sel_idx = ray.get(_r)
            col = t[vec_col]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            x = np.asarray(col.to_pylist(), dtype=np.float64)
            if len(x) == 0:
                return pa.table({"p": pa.array([], pa.int64()),
                                 "s": pa.array([], pa.float64())})
            xn = np.linalg.norm(x, axis=1, keepdims=True)
            xn[xn == 0] = 1.0
            s = np.maximum(x / xn @ pvm.T, 0.0)   # (batch, pool)
            cur = s[:, sel_idx].max(axis=1) if sel_idx \
                else np.zeros(len(x))
            cov = np.maximum(cur[:, None], s).sum(axis=0)  # per cand
            return pa.table({
                "p": pa.array(np.arange(len(pvm)), pa.int64()),
                "s": pa.array(cov, pa.float64()),
            })

        parts = ds.map_batches(partial, batch_format="pyarrow") \
            .to_pandas().groupby("p", sort=True)["s"].sum()
        gains = np.round(parts.to_numpy(), 6)
        order = np.lexsort((np.asarray(pool_ids), -gains))
        best = next(i for i in order if pool_ids[i] not in selected)
        selected.append(pool_ids[best])
        rows.append({"round": len(selected) - 1,
                     "sel_id": int(pool_ids[best]),
                     "coverage": float(gains[best])})

    return _rd.from_arrow(pa.table({
        "round": pa.array([r["round"] for r in rows], pa.int64()),
        "sel_id": pa.array([r["sel_id"] for r in rows], pa.int64()),
        "coverage": pa.array([r["coverage"] for r in rows],
                             pa.float64()),
    }))


def greedy_source_cover(ds, k: int = 5, group_col: str = "source",
                        id_col: str = "doc_id", text_col: str = "text",
                        num_partitions: int = 16):
    """Greedy maximum-coverage source selection (the (1−1/e) greedy on
    weighted set cover, Nemhauser et al. 1978): pick ``k`` sources
    whose union of distinct word TRIGRAMS covers the most vocabulary —
    the "which feeds actually add content" question a mixing recipe
    starts from, the set-theoretic sibling of
    :func:`facility_location_select`'s geometric coverage.

    Shuffle shape: one explode pass to DISTINCT (source, trigram)
    rows, ONE trigram-keyed exchange (a gram's full source list lands
    whole per partition, so "already covered" is partition-local),
    then one map pass per round with the broadcast selection —
    coverage state is RECOMPUTED from the selected list each round
    (selection-only set ops, bit-equal in any engine; the
    ``stages/topics.py`` recompute-over-state trade).  All-integer
    arithmetic: no float can disagree with the SQL unroll.

    Output: ``(round, sel_source, new_grams, cum_grams)``.
    """
    import ray

    import ray.data as _rd

    from dedup_ray.util.exchange import exchange_group_apply

    def grams(t: pa.Table) -> pa.Table:
        srcs = t[group_col].to_pylist()
        texts = t[text_col].to_pylist()
        out_s, out_g = [], []
        for s, tx in zip(srcs, texts):
            toks = [w for w in (tx or "").split(" ") if w]
            for i in range(len(toks) - 2):
                out_s.append(s)
                out_g.append(f"{toks[i]} {toks[i + 1]} {toks[i + 2]}")
        return pa.table({group_col: pa.array(out_s, pa.string()),
                         "gram": pa.array(out_g, pa.string())})

    def dedupe(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({group_col: pa.array([], pa.string()),
                             "gram": pa.array([], pa.string())})
        df = t.to_pandas().drop_duplicates([group_col, "gram"])
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = exchange_group_apply(
        ds.map_batches(grams, batch_format="pyarrow"), ["gram"], dedupe,
        num_partitions,
        empty_schema=pa.schema([(group_col, pa.string()),
                                ("gram", pa.string())]),
    ).materialize()

    selected: list[str] = []
    rows = []
    cum = 0
    for r in range(k):
        ref = ray.put(list(selected))

        def gains(t: pa.Table, _r=ref) -> pa.Table:
            sel = set(ray.get(_r))
            if t.num_rows == 0:
                return pa.table({group_col: pa.array([], pa.string()),
                                 "g": pa.array([], pa.int64())})
            df = t.to_pandas()
            cov = df[df[group_col].isin(sel)]["gram"].unique()
            un = df[~df["gram"].isin(cov)]
            g = un.groupby(group_col, sort=True).size().reset_index(name="g")
            return pa.Table.from_pandas(g, preserve_index=False)

        parts = pairs.map_batches(gains, batch_format="pyarrow",
                                  batch_size=None).to_pandas()
        if parts.empty:
            break
        agg = parts.groupby(group_col, sort=True)["g"].sum()
        agg = agg[~agg.index.isin(selected)]
        if agg.empty or agg.max() == 0:
            break
        best = agg[agg == agg.max()].index.min()  # ties → lexicographic
        gain = int(agg[best])
        selected.append(best)
        cum += gain
        rows.append({"round": r, "sel_source": best,
                     "new_grams": gain, "cum_grams": cum})

    return _rd.from_arrow(pa.table({
        "round": pa.array([x["round"] for x in rows], pa.int64()),
        "sel_source": pa.array([x["sel_source"] for x in rows],
                               pa.string()),
        "new_grams": pa.array([x["new_grams"] for x in rows], pa.int64()),
        "cum_grams": pa.array([x["cum_grams"] for x in rows], pa.int64()),
    }))
