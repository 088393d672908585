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
