"""Distributed BM25 retrieval over a document table.

The ranking primitive a curation pipeline reaches for when filtering a
corpus by relevance to a topic, or when hunting benchmark contamination
by querying the training set with eval questions (the retrieval-side
complement of ``webclean.fuzzy_decontaminate``'s n-gram rule).

Shape (two corpus passes, no shuffle wider than a tiny grouped sum):

1. **Stats pass**: per-batch partials of (doc count, total token count)
   and per-query-term document frequency — a document's text lives
   wholly in one row, so tf/df/dl are batch-local exact; partials reduce
   through one driver-bounded aggregate (``len(query)`` + 2 scalars).
2. **Score pass**: the idf/avgdl constants broadcast via ``ray.put``;
   each batch scores its docs vectorized (Robertson/Sparck Jones BM25:
   ``idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))``, tf saturation
   ``(tf·(k1+1))/(tf + k1·(1 - b + b·dl/avgdl))``), keeps its local
   top-k, and one bounded ``sort.limit(k)`` finishes — the all-to-all
   moves at most ``k × n_blocks`` rows.

Scores are rounded to 6 decimals and ranked on the ROUNDED value with
doc-id tie-breaks, so the ordering is reproducible across engines (sum
association differs at ~1e-16; the rounding absorbs it).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def bm25_topk(docs_ds, query_terms: list[str], k: int = 20,
              k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id", text_col: str = "text"):
    """Top-``k`` docs by BM25 score for ``query_terms`` (whitespace
    tokenization, exact term match).  Returns ``(id_col, score)`` sorted
    by (score desc, id) — deterministic under any partitioning."""
    import ray

    terms = sorted(set(query_terms))

    def stats(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(
            pc.coalesce(t[text_col], pa.scalar("", t[text_col].type)), " "
        )
        dl = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        rows = {"n_docs": [int(t.num_rows)], "total_len": [int(dl.sum())]}
        flat = toks.combine_chunks()
        parents = pc.list_parent_indices(flat).to_numpy(
            zero_copy_only=False)
        vals = pc.list_flatten(flat)
        for term in terms:
            mask = pc.equal(vals, term).to_numpy(zero_copy_only=False)
            rows[f"df:{term}"] = [int(len(np.unique(parents[mask])))]
        return pa.table(rows)

    part = docs_ds.map_batches(stats, batch_format="pyarrow")
    totals = {name: 0 for name in ["n_docs", "total_len"]
              + [f"df:{t}" for t in terms]}
    for batch in part.iter_batches(batch_format="pyarrow", batch_size=4096):
        for name in totals:
            totals[name] += int(pc.sum(batch[name]).as_py() or 0)
    n_docs = max(1, totals["n_docs"])
    avgdl = max(1e-9, totals["total_len"] / n_docs)
    idf = {
        t: float(np.log(1.0 + (n_docs - totals[f"df:{t}"] + 0.5)
                        / (totals[f"df:{t}"] + 0.5)))
        for t in terms
    }
    consts = ray.put((idf, avgdl, k1, b))

    def score(t: pa.Table) -> pa.Table:
        idf_, avgdl_, k1_, b_ = ray.get(consts)
        toks = pc.split_pattern(
            pc.coalesce(t[text_col], pa.scalar("", t[text_col].type)), " "
        ).combine_chunks()
        dl = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        parents = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False)
        vals = pc.list_flatten(toks)
        s = np.zeros(t.num_rows, np.float64)
        denom_dl = k1_ * (1.0 - b_ + b_ * dl / avgdl_)
        for term, w in idf_.items():
            mask = pc.equal(vals, term).to_numpy(zero_copy_only=False)
            tf = np.bincount(parents[mask],
                             minlength=t.num_rows).astype(np.float64)
            s += w * (tf * (k1_ + 1.0)) / np.where(tf > 0.0,
                                                   tf + denom_dl, 1.0)
        keep = np.flatnonzero(s > 0.0)
        s = np.round(s[keep], 6)
        if len(keep) > k:  # batch-local top-k: bound the final sort input
            order = np.lexsort(
                (t[id_col].take(pa.array(keep)).to_numpy(
                    zero_copy_only=False), -s))
            keep, s = keep[order[:k]], s[order[:k]]
        return pa.table({
            id_col: t[id_col].take(pa.array(keep)),
            "score": pa.array(s, pa.float64()),
        })

    return (
        docs_ds.map_batches(score, batch_format="pyarrow")
        .sort(["score", id_col], descending=[True, False])
        .limit(k)
    )


def term_count_topk(docs_ds, query_terms: list[str], k: int = 20,
                    id_col: str = "doc_id", text_col: str = "text"):
    """Top-``k`` docs by RAW query-term count — the trivial second
    retriever for fusion experiments (same batch-local top-k + bounded
    final sort shape as :func:`bm25_topk`).  Returns ``(id_col, cnt)``
    sorted by (cnt desc, id)."""
    terms = sorted(set(query_terms))

    def score(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(
            pc.coalesce(t[text_col], pa.scalar("", t[text_col].type)), " "
        ).combine_chunks()
        parents = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False)
        vals = pc.list_flatten(toks)
        s = np.zeros(t.num_rows, np.int64)
        for term in terms:
            mask = pc.equal(vals, term).to_numpy(zero_copy_only=False)
            s += np.bincount(parents[mask], minlength=t.num_rows)
        keep = np.flatnonzero(s > 0)
        s = s[keep]
        if len(keep) > k:
            order = np.lexsort(
                (t[id_col].take(pa.array(keep)).to_numpy(
                    zero_copy_only=False), -s))
            keep, s = keep[order[:k]], s[order[:k]]
        return pa.table({
            id_col: t[id_col].take(pa.array(keep)),
            "cnt": pa.array(s, pa.int64()),
        })

    return (
        docs_ds.map_batches(score, batch_format="pyarrow")
        .sort(["cnt", id_col], descending=[True, False])
        .limit(k)
    )


def rrf_fuse(rankings: list, k: int = 20, c: int = 60,
             id_col: str = "doc_id") -> pa.Table:
    """Reciprocal-rank fusion (Cormack et al. 2009): combine retriever
    result lists by ``rrf(d) = Σ_lists 1/(c + rank_d)`` — the
    training-free ensemble that beats either list alone because rank
    positions, unlike scores, are comparable across scoring scales.

    Each input is a retriever OUTPUT (a Dataset or Table already sorted
    by its own score) — k-bounded by construction, so fusing on the
    driver is O(Σk) and never corpus-sized.  Rank is 1-based list
    position.  Returns the top-``k`` ``(id_col, rrf)`` rows by
    (rrf desc, id)."""
    agg: dict = {}
    for rk in rankings:
        rows = rk.to_pylist() if isinstance(rk, pa.Table) else rk.take_all()
        for r, row in enumerate(rows, 1):
            agg[row[id_col]] = agg.get(row[id_col], 0.0) + 1.0 / (c + r)
    top = sorted(agg.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:k]
    return pa.table({
        id_col: pa.array([t[0] for t in top], pa.int64()),
        "rrf": pa.array([round(t[1], 6) for t in top], pa.float64()),
    })


def phrase_search(ds, phrase: list[str], id_col: str = "doc_id",
                  text_col: str = "text", num_partitions: int = 8):
    """Exact consecutive-token phrase retrieval over positional postings —
    the "exact phrase" query class boolean AND retrieval cannot express
    (AND finds co-occurrence anywhere; this requires adjacency).

    Postings are pruned to the phrase's own terms BEFORE any shuffle (the
    phrase is a query-time constant, so the prune is k vectorized
    equality scans per batch, one per phrase slot — rows for all other
    tokens never leave the map task), then ONE exchange on the doc id
    co-locates each candidate
    document's surviving positions.  The in-partition adjacency check is
    pure integer set logic: occurrence keys ``doc·2³² + pos`` per phrase
    slot, ``np.isin(candidates + k, slot_k)`` chains — no per-doc Python,
    and repeated words in the phrase are handled by emitting one posting
    row per matching slot.

    Token law: ``string_split(text, ' ')`` with empties kept, 1-based
    positions (the bigram-LM law, replayed verbatim by the SQL twin).
    Output: ``(id_col, n_matches, first_pos)`` for documents with ≥ 1
    match.
    """
    from dedup_ray.util.exchange import exchange_group_apply

    terms = list(phrase)
    k = len(terms)

    def postings(t: pa.Table) -> pa.Table:
        txt = t[text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        txt = pc.coalesce(txt, pa.scalar("", pa.string()))
        toks = pc.split_pattern(txt, " ")
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        parents = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        starts = np.r_[0, np.cumsum(lens)[:-1]].astype(np.int64)
        pos_all = (np.arange(len(parents), dtype=np.int64)
                   - starts[parents] + 1)
        ids_all = t[id_col].to_numpy(zero_copy_only=False)[parents]
        id_parts, pos_parts, slot_parts = [], [], []
        for s, term in enumerate(terms):
            m = pc.equal(flat, pa.scalar(term)).to_numpy(
                zero_copy_only=False)
            sel = np.flatnonzero(m)
            id_parts.append(ids_all[sel])
            pos_parts.append(pos_all[sel])
            slot_parts.append(np.full(len(sel), s, np.int64))
        return pa.table({
            id_col: pa.array(
                np.concatenate(id_parts) if id_parts
                else np.empty(0, np.int64), pa.int64()),
            "pos": pa.array(
                np.concatenate(pos_parts) if pos_parts
                else np.empty(0, np.int64), pa.int64()),
            "slot": pa.array(
                np.concatenate(slot_parts) if slot_parts
                else np.empty(0, np.int64), pa.int64()),
        })

    posts = ds.map_batches(postings, batch_format="pyarrow")

    def match(part: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "n_matches": pa.array([], pa.int64()),
                          "first_pos": pa.array([], pa.int64())})
        if part.num_rows == 0 or id_col not in part.column_names:
            return empty
        ids = part[id_col].to_numpy(zero_copy_only=False)
        pos = part["pos"].to_numpy(zero_copy_only=False)
        slot = part["slot"].to_numpy(zero_copy_only=False)
        key = ids * (1 << 32) + pos
        cand = key[slot == 0]
        for s in range(1, k):
            cand = cand[np.isin(cand + s, key[slot == s])]
        if not len(cand):
            return empty
        doc = (cand >> 32).astype(np.int64)
        p = (cand & 0xFFFFFFFF).astype(np.int64)
        g = pa.table({id_col: pa.array(doc), "p": pa.array(p)})
        agg = g.group_by(id_col).aggregate([("p", "count"), ("p", "min")])
        return agg.rename_columns([id_col, "n_matches", "first_pos"])

    return exchange_group_apply(posts, id_col, match, num_partitions)


def wand_topk(docs_ds, query_terms: list[str], k: int = 20,
              k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id", text_col: str = "text",
              stats_out: dict | None = None):
    """WAND-style max-score pruned BM25 top-k (Broder et al., CIKM 2003
    adapted to batch streaming): returns EXACTLY :func:`bm25_topk`'s
    result, but most documents never reach the per-term tf scoring
    loop.

    Per-term upper bound: ``score_t < idf(t)·(k1+1)`` (tf-saturation
    limit), so ``score(doc) ≤ UB(doc) = Σ_{t∈doc} idf(t)·(k1+1)`` — a
    presence-mask dot product, far cheaper than tf counting.

    Distributed two-phase analog of WAND's moving threshold:

    1. **Seed pass**: each batch exact-scores only its top-k docs BY
       UB; the k-th best rounded score across these seeds is a valid
       LOWER bound θ on the final k-th score (the seeds are real
       scores, and the true top-k can only beat them).
    2. **Pruned pass**: every doc with ``UB < θ − 1e-6`` is provably
       outside the rounded top-k (score ≤ UB, ranking uses 6dp
       rounding, the margin covers the rounding slack) and is skipped
       before tf counting; survivors score exactly, batch-local top-k,
       one bounded final sort.

    ``stats_out`` (optional dict) receives ``theta`` / ``total`` /
    ``scored`` so callers can observe the pruned fraction.
    """
    import ray

    terms = sorted(set(query_terms))

    def stats(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(
            pc.coalesce(t[text_col], pa.scalar("", t[text_col].type)), " "
        )
        dl = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        rows = {"n_docs": [int(t.num_rows)], "total_len": [int(dl.sum())]}
        flat = toks.combine_chunks()
        parents = pc.list_parent_indices(flat).to_numpy(
            zero_copy_only=False)
        vals = pc.list_flatten(flat)
        for term in terms:
            mask = pc.equal(vals, term).to_numpy(zero_copy_only=False)
            rows[f"df:{term}"] = [int(len(np.unique(parents[mask])))]
        return pa.table(rows)

    part = docs_ds.map_batches(stats, batch_format="pyarrow")
    totals = {name: 0 for name in ["n_docs", "total_len"]
              + [f"df:{t}" for t in terms]}
    for batch in part.iter_batches(batch_format="pyarrow", batch_size=4096):
        for name in totals:
            totals[name] += int(pc.sum(batch[name]).as_py() or 0)
    n_docs = max(1, totals["n_docs"])
    avgdl = max(1e-9, totals["total_len"] / n_docs)
    idf = {
        t: float(np.log(1.0 + (n_docs - totals[f"df:{t}"] + 0.5)
                        / (totals[f"df:{t}"] + 0.5)))
        for t in terms
    }
    consts = ray.put((idf, avgdl, k1, b))

    def _tok(t: pa.Table):
        toks = pc.split_pattern(
            pc.coalesce(t[text_col], pa.scalar("", t[text_col].type)), " "
        ).combine_chunks()
        dl = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        parents = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False)
        vals = pc.list_flatten(toks)
        return dl, parents, vals

    def _ub(t: pa.Table, idf_, k1_):
        _, parents, vals = _tok(t)
        ub = np.zeros(t.num_rows, np.float64)
        for term, w in idf_.items():
            mask = pc.equal(vals, term).to_numpy(zero_copy_only=False)
            present = np.zeros(t.num_rows, bool)
            present[np.unique(parents[mask])] = True
            ub += np.where(present, w * (k1_ + 1.0), 0.0)
        return ub

    def _exact(t: pa.Table, rows: np.ndarray, idf_, avgdl_, k1_, b_):
        sub = t.take(pa.array(rows))
        dl, parents, vals = _tok(sub)
        s = np.zeros(sub.num_rows, np.float64)
        denom_dl = k1_ * (1.0 - b_ + b_ * dl / avgdl_)
        for term, w in idf_.items():
            mask = pc.equal(vals, term).to_numpy(zero_copy_only=False)
            tf = np.bincount(parents[mask],
                             minlength=sub.num_rows).astype(np.float64)
            s += w * (tf * (k1_ + 1.0)) / np.where(tf > 0.0,
                                                   tf + denom_dl, 1.0)
        return sub, s

    def seed(t: pa.Table) -> pa.Table:
        idf_, avgdl_, k1_, b_ = ray.get(consts)
        ub = _ub(t, idf_, k1_)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        top = np.lexsort((ids, -ub))[:k]
        top = top[ub[top] > 0.0]
        sub, s = _exact(t, top, idf_, avgdl_, k1_, b_)
        return pa.table({id_col: sub[id_col],
                         "score": pa.array(np.round(s, 6), pa.float64())})

    seeds = docs_ds.map_batches(seed, batch_format="pyarrow").to_pandas()
    if len(seeds) >= k:
        theta = float(np.sort(seeds["score"].to_numpy())[::-1][k - 1])
    else:
        theta = -np.inf
    thr = theta - 1e-6

    def pruned(t: pa.Table) -> pa.Table:
        idf_, avgdl_, k1_, b_ = ray.get(consts)
        ub = _ub(t, idf_, k1_)
        cand = np.flatnonzero(ub >= thr)
        sub, s = _exact(t, cand, idf_, avgdl_, k1_, b_)
        keep = np.flatnonzero(s > 0.0)
        s = np.round(s[keep], 6)
        if len(keep) > k:
            order = np.lexsort(
                (sub[id_col].take(pa.array(keep)).to_numpy(
                    zero_copy_only=False), -s))
            keep, s = keep[order[:k]], s[order[:k]]
        return pa.table({
            id_col: sub[id_col].take(pa.array(keep)),
            "score": pa.array(s, pa.float64()),
        })

    if stats_out is not None:
        def count(t: pa.Table) -> pa.Table:
            idf_, _, k1_, _ = ray.get(consts)
            ub = _ub(t, idf_, k1_)
            return pa.table({"total": [int(t.num_rows)],
                             "scored": [int((ub >= thr).sum())]})

        c = docs_ds.map_batches(count, batch_format="pyarrow").to_pandas()
        stats_out.update(theta=theta, total=int(c["total"].sum()),
                         scored=int(c["scored"].sum()))

    return (
        docs_ds.map_batches(pruned, batch_format="pyarrow")
        .sort(["score", id_col], descending=[True, False])
        .limit(k)
    )


def mmr_rerank(docs_ds, emb_ds, query_terms: list[str],
               k_pool: int = 20, k_out: int = 10, lam: float = 0.7,
               k1: float = 1.2, b: float = 0.75,
               id_col: str = "doc_id", text_col: str = "text",
               vec_id_col: str = "vec_id", vec_col: str = "embedding"):
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR 1998): take the BM25 top-``k_pool`` and greedily re-rank for
    relevance AND diversity,

        mmr(d) = λ·rel(d) − (1−λ)·max_{s∈S} cos(d, s)

    — the answer to near-duplicate search results that a dedup'd corpus
    still produces (distinct urls, same story).

    Distributed shape: ALL corpus-scale work is the BM25 pass
    (:func:`bm25_topk`) plus one broadcast-filter fetch of the pool's
    embedding rows; the greedy itself runs on the BOUNDED pool
    (``k_pool`` × ``k_pool`` cosines) on the driver — MMR over an
    unbounded candidate set is never the operator anyone ships.
    Relevance is the 6dp-rounded BM25 score, cosines round to 6dp
    before the max-chain, and every argmax breaks ties to the smaller
    id, so the greedy replays exactly in SQL.

    Returns ``(rank, doc_id, mmr)`` for the first ``k_out`` picks
    (rank 0's mmr = λ·rel, no diversity term yet).
    """
    import ray.data as _rd

    empty = pa.table({"rank": pa.array([], pa.int64()),
                      id_col: pa.array([], pa.int64()),
                      "mmr": pa.array([], pa.float64())})
    pool = bm25_topk(docs_ds, query_terms, k=k_pool, k1=k1, b=b,
                     id_col=id_col, text_col=text_col).to_pandas()
    if pool.empty:  # no term matches: Ray drops columns at 0 rows
        return _rd.from_arrow(empty)
    ids = pool[id_col].to_numpy()
    id_set = set(int(i) for i in ids)

    def fetch(t: pa.Table) -> pa.Table:
        mask = pa.array([int(v) in id_set
                         for v in t[vec_id_col].to_pylist()])
        return t.filter(mask)

    vdf = emb_ds.map_batches(fetch, batch_format="pyarrow").to_pandas()
    vmap = {int(r[vec_id_col]): np.asarray(list(r[vec_col]),
                                           dtype=np.float64)
            for _, r in vdf.iterrows()}
    keep = [i for i, d in enumerate(ids) if int(d) in vmap]
    if not keep:  # no pool doc has an embedding row
        return _rd.from_arrow(empty)
    ids = ids[keep]
    rel = pool["score"].to_numpy()[keep]
    V = np.stack([vmap[int(d)] for d in ids])
    n = np.linalg.norm(V, axis=1, keepdims=True)
    n[n == 0] = 1.0
    V = V / n
    S = np.round(V @ V.T, 6)

    sel: list[int] = []
    cur = np.zeros(len(ids))
    out_rank, out_id, out_m = [], [], []
    for r in range(min(k_out, len(ids))):
        mmr = np.round(lam * rel - (1.0 - lam) * cur, 6)
        order = np.lexsort((ids, -mmr))
        best = next(i for i in order if i not in sel)
        sel.append(best)
        out_rank.append(r)
        out_id.append(int(ids[best]))
        out_m.append(float(mmr[best]))
        cur = np.maximum(cur, S[:, best])

    return _rd.from_arrow(pa.table({
        "rank": pa.array(out_rank, pa.int64()),
        id_col: pa.array(out_id, pa.int64()),
        "mmr": pa.array(out_m, pa.float64()),
    }))
