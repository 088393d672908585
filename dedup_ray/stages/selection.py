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
