"""Multinomial Naive Bayes text classifier, trained and scored in-engine.

The trainable counterpart of the broadcast scorers in
`stages/classifier.py` (which load a PRE-FITTED artifact — ST4): NB fits
from nothing but token counts, so the whole train step is aggregation the
engine already does well — one token-keyed exchange folds (label, token)
counts, the driver holds only the (V × C)-bounded count table (the same
broadcast license as the IDF table, ST3 / `conformance/features.py`), and
scoring is one stateless broadcast pass.  The classic label-audit /
lang-id-v2 / quality-routing model for a crawl pipeline: deterministic,
no gradient, exactly SQL-replayable (Laplace-smoothed log probabilities,
argmax with a 6-dp round and lexicographic tie-break written into BOTH
engines).

Scale shape: corpus → (label, token, n) partials per batch (vocab-bounded
per block), one narrow exchange, V×C floats broadcast via ``ray.put``.
Nothing corpus-sized ever reaches the driver; the model matrix is the
only central state (100 TB corpus, 10^6 vocab × 10 classes = 80 MB —
object-store broadcast, read zero-copy in every score task).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from dedup_ray.stages.textstats import explode_tokens


def _label_token_counts(ds, label_col: str, text_col: str, id_col: str,
                        num_partitions: int):
    """(label, token, n) fold: per-batch partials, one token-keyed
    exchange.  Empty docs carry the ``str(id)`` sentinel token (the M4
    tokenizer convention), so every doc contributes to its class mass."""
    from dedup_ray.util.exchange import exchange_group_apply

    def partial(t: pa.Table) -> pa.Table:
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        flat, parents, n = explode_tokens(t[text_col], t.num_rows)
        labels = t[label_col]
        if isinstance(labels, pa.ChunkedArray):
            labels = labels.combine_chunks()
        out_lab = labels.take(pa.array(parents))
        out_tok = flat
        empty_rows = np.flatnonzero(n == 0)
        if len(empty_rows):
            sent_lab = labels.take(pa.array(empty_rows))
            sent_tok = pa.array(
                [str(v) for v in ids.take(pa.array(empty_rows)).to_pylist()],
                pa.string(),
            )
            out_lab = pa.concat_arrays([out_lab, sent_lab])
            out_tok = pa.concat_arrays([out_tok, sent_tok])
        g = pa.table({"label": out_lab, "token": out_tok}) \
            .group_by(["label", "token"]).aggregate([([], "count_all")])
        return g.rename_columns(["label", "token", "n"])

    def fold(t: pa.Table) -> pa.Table:
        g = t.group_by(["label", "token"]).aggregate([("n", "sum")])
        return g.rename_columns(["label", "token", "n"])

    return exchange_group_apply(
        ds.map_batches(partial, batch_format="pyarrow"), ["token"], fold,
        num_partitions,
        empty_schema=pa.schema([("label", pa.string()),
                                ("token", pa.string()),
                                ("n", pa.int64())]),
    )


def nb_train(ds, label_col: str = "lang", text_col: str = "text",
             id_col: str = "doc_id", num_partitions: int = 8) -> dict:
    """Fit the smoothed model.  Returns ``{classes, vocab, logp, logprior}``
    — ``logp[v, c] = ln((n_vc + 1) / (n_c + V))`` (Laplace α=1 over the
    training vocabulary), ``logprior[c] = ln(docs_c / docs)``.  Driver
    state: the V×C count table and the C-row prior table, both bounded.
    """
    from ray.data.aggregate import Count

    counts = _label_token_counts(
        ds, label_col, text_col, id_col, num_partitions
    ).to_pandas()  # V×C-bounded by construction
    prior = (
        ds.groupby(label_col).aggregate(Count(alias_name="nd")).to_pandas()
    )

    classes = sorted(prior[label_col].tolist())
    vocab = sorted(counts["token"].unique().tolist())
    cidx = {c: i for i, c in enumerate(classes)}
    vidx = {t: i for i, t in enumerate(vocab)}
    mat = np.zeros((len(vocab), len(classes)), dtype=np.float64)
    mat[[vidx[t] for t in counts["token"]],
        [cidx[c] for c in counts["label"]]] = counts["n"].to_numpy()
    n_c = mat.sum(axis=0)
    logp = np.log((mat + 1.0) / (n_c + len(vocab)))
    nd = prior.set_index(label_col)["nd"]
    logprior = np.log(
        np.array([nd.loc[c] for c in classes], dtype=np.float64) / nd.sum()
    )
    return {"classes": classes, "vocab": vidx, "logp": logp,
            "logprior": logprior}


def nb_score(ds, model: dict, text_col: str = "text",
             id_col: str = "doc_id", out_col: str = "nb_label",
             with_prob: bool = False, keep_cols: tuple = ()):
    """Broadcast scoring pass: per doc, ``score_c = logprior_c +
    Σ_t tf_t · logp[t, c]``; emit ``(id, out_col, nb_score)`` with the
    argmax at 6-dp rounding, ties to the lexicographically smallest class
    (classes are stored sorted, so ``argmax``'s first-max rule IS the
    tie-break).  Tokens outside the training vocabulary are dropped (the
    standard multinomial-NB convention).  O(tokens × C) per batch —
    vectorized gather + segment add, no per-row Python.

    ``with_prob`` adds ``nb_prob`` — the softmax posterior of the argmax
    class computed max-shifted over the ROUNDED scores
    (``1 / Σ_c exp(s_c − s_max)``: both engines exponentiate the same
    6-dp differences, so underflow of hopeless classes to 0.0 is
    identical).  ``keep_cols`` passes input columns through (e.g. the
    true label for a downstream calibration join-free pass)."""
    model_ref = ray.put(model)

    def f(t: pa.Table) -> pa.Table:
        m = ray.get(model_ref)
        vidx, logp, logprior = m["vocab"], m["logp"], m["logprior"]
        classes = np.array(m["classes"])
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        flat, parents, n = explode_tokens(t[text_col], t.num_rows)
        toks = flat.to_pylist()
        par = np.asarray(parents, dtype=np.int64)
        empty_rows = np.flatnonzero(n == 0)
        if len(empty_rows):  # sentinel token, as at train time
            sent = [str(v) for v in
                    ids.take(pa.array(empty_rows)).to_pylist()]
            toks.extend(sent)
            par = np.concatenate([par, empty_rows.astype(np.int64)])
        known = np.array([vidx.get(tk, -1) for tk in toks], dtype=np.int64)
        keep = known >= 0
        scores = np.tile(logprior, (t.num_rows, 1))
        np.add.at(scores, par[keep], logp[known[keep], :])
        scores = np.round(scores, 6)
        best = scores.argmax(axis=1)
        smax = scores[np.arange(t.num_rows), best]
        cols = {
            id_col: ids,
            out_col: pa.array(classes[best].tolist(), pa.string()),
            "nb_score": pa.array(smax, pa.float64()),
        }
        if with_prob:
            z = np.exp(scores - smax[:, None]).sum(axis=1)
            cols["nb_prob"] = pa.array(np.round(1.0 / z, 6), pa.float64())
        for kc in keep_cols:
            cols[kc] = t[kc]
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow")


def nb_true_class_prob(ds, model: dict, label_col: str,
                       text_col: str = "text", id_col: str = "doc_id"):
    """Softmax posterior of each doc's TRUE class (max-shifted over the
    6-dp-rounded score matrix, same contract as ``nb_score
    with_prob``) — the input to conformal calibration, where the
    nonconformity of a labeled example is ``1 − p_true``.  Output:
    ``(id, p_true)`` at 6 dp."""
    model_ref = ray.put(model)

    def f(t: pa.Table) -> pa.Table:
        m = ray.get(model_ref)
        vidx, logp, logprior = m["vocab"], m["logp"], m["logprior"]
        cidx = {c: i for i, c in enumerate(m["classes"])}
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        flat, parents, n = explode_tokens(t[text_col], t.num_rows)
        toks = flat.to_pylist()
        par = np.asarray(parents, dtype=np.int64)
        empty_rows = np.flatnonzero(n == 0)
        if len(empty_rows):
            sent = [str(v) for v in
                    ids.take(pa.array(empty_rows)).to_pylist()]
            toks.extend(sent)
            par = np.concatenate([par, empty_rows.astype(np.int64)])
        known = np.array([vidx.get(tk, -1) for tk in toks], dtype=np.int64)
        keep = known >= 0
        scores = np.tile(logprior, (t.num_rows, 1))
        np.add.at(scores, par[keep], logp[known[keep], :])
        scores = np.round(scores, 6)
        smax = scores.max(axis=1)
        z = np.exp(scores - smax[:, None]).sum(axis=1)
        true_idx = np.array([cidx[v] for v in
                             t[label_col].to_pylist()], dtype=np.int64)
        p_true = np.exp(scores[np.arange(t.num_rows), true_idx] - smax) / z
        return pa.table({
            id_col: ids,
            "p_true": pa.array(np.round(p_true, 6), pa.float64()),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def nb_count_tables(ds, label_col: str = "lang", text_col: str = "text",
                    id_col: str = "doc_id", num_partitions: int = 8):
    """The model's SUFFICIENT STATISTICS as plain tables:
    ``(label, token, n)`` token counts and ``(label, nd)`` doc counts.
    Counts are ADDITIVE, so incremental training is a concat — a new
    crawl shard's tables merge into yesterday's without touching
    yesterday's corpus (the same shard-update story the dedup index
    has)."""
    from ray.data.aggregate import Count

    counts = _label_token_counts(
        ds, label_col, text_col, id_col, num_partitions).to_pandas()
    prior = ds.groupby(label_col).aggregate(
        Count(alias_name="nd")).to_pandas()
    prior = prior.rename(columns={label_col: "label"})
    return counts, prior


def nb_from_counts(counts, prior) -> dict:
    """Fit the model from (possibly merged) sufficient statistics —
    ``nb_train`` == ``nb_from_counts(*nb_count_tables(ds))`` exactly,
    and summing two shards' tables reproduces full-corpus training
    bit-for-bit (additivity pytest)."""
    counts = counts.groupby(["label", "token"], as_index=False)["n"].sum()
    prior = prior.groupby("label", as_index=False)["nd"].sum()

    classes = sorted(prior["label"].tolist())
    vocab = sorted(counts["token"].unique().tolist())
    cidx = {c: i for i, c in enumerate(classes)}
    vidx = {t: i for i, t in enumerate(vocab)}
    mat = np.zeros((len(vocab), len(classes)), dtype=np.float64)
    mat[[vidx[t] for t in counts["token"]],
        [cidx[c] for c in counts["label"]]] = counts["n"].to_numpy()
    n_c = mat.sum(axis=0)
    logp = np.log((mat + 1.0) / (n_c + len(vocab)))
    nd = prior.set_index("label")["nd"]
    logprior = np.log(
        np.array([nd.loc[c] for c in classes], dtype=np.float64)
        / nd.sum())
    return {"classes": classes, "vocab": vidx, "logp": logp,
            "logprior": logprior}
