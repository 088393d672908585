"""Text-analysis operators for training-data pipelines.

- tokenization/explode with the reference's null sentinel (``wordlist.py``
  M4) and global IDF (``IDF.py`` A1 — corpus-frequency, not doc-frequency);
- quality scoring (length / punctuation / stopword ratios);
- language ID (character-class + stopword n-gram heuristic, deterministic);
- document fingerprinting (winnowing: min rolling hash per window).

All stages are batch transforms over Arrow; floats are rounded to 6 decimals
at the emit point so results hash identically against the DuckDB oracles.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from dedup_ray.util.dsutil import as_arrow
from dedup_ray.util.hashing import stable64

# small, fixed stopword sets per language (markers for the lang-id heuristic)
STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "that", "was"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "que", "pas"},
    "es": {"el", "la", "los", "las", "es", "un", "una", "que", "de", "no"},
    "zh": set(),  # handled by the CJK character-class rule
}


def explode_tokens(
    txt, num_rows: int
) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Shared token-explode preamble: split a (chunked) string column on
    single spaces, drop empty tokens, null text == empty page.

    → (flat tokens as a string Array, parent row index per token,
    token count per input row).  Used by the tokenizer and the
    context-window chunker so the explode idiom lives in one place.
    """
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    txt = pc.coalesce(txt, pa.scalar("", txt.type))
    lists = pc.split_pattern(txt, " ")
    flat = lists.flatten()
    parents = pc.list_parent_indices(lists)
    mask = pc.not_equal(flat, "")
    flat = pc.cast(flat.filter(mask), pa.string())
    parents = parents.filter(mask).to_numpy(zero_copy_only=False)
    n = np.bincount(parents, minlength=num_rows).astype(np.int64)
    return flat, parents, n


def tokenize_explode(ds, id_col: str = "doc_id", text_col: str = "text"):
    """M4: one row per single-space-separated token; empty docs emit their
    own id as a sentinel token (``wordlist.py:24-27`` — never intersects).

    Vectorized: Arrow split + list_parent_indices + an empty-token filter;
    only the (rare) zero-token sentinel rows are built in Python.
    """

    def f(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        flat, parents, n = explode_tokens(batch[text_col], batch.num_rows)
        out_ids = ids.take(pa.array(parents))
        out_toks = flat
        empty_rows = np.flatnonzero(n == 0)
        if len(empty_rows):
            sent_ids = ids.take(pa.array(empty_rows))
            sent_toks = pa.array(
                [str(v) for v in sent_ids.to_pylist()], pa.string()
            )
            out_ids = pa.concat_arrays([out_ids, sent_ids])
            out_toks = pa.concat_arrays([out_toks, sent_toks])
        return pa.table({id_col: out_ids, "token": out_toks})

    return ds.map_batches(f, batch_format="pyarrow")


def idf_table(token_ds, token_col: str = "token"):
    """A1: IDF(t) = total_token_rows / count(t) (corpus frequency, as
    ``IDF.py:15-17`` computes it).  Distributed: groupby count + count()."""
    total = token_ds.count()
    counts = token_ds.groupby(token_col).count()

    def f(batch: pa.Table) -> pa.Table:
        idf = pc.divide(float(total), pc.cast(batch["count()"], pa.float64()))
        return pa.table(
            {
                token_col: batch[token_col],
                "idf": pc.round(idf, ndigits=6),
            }
        )

    return counts.map_batches(f, batch_format="pyarrow")


def token_logfreq_score(ds, id_col: str = "doc_id", text_col: str = "text",
                        num_partitions: int = 16):
    """Frequency-based pseudo-perplexity quality score: per document, the
    mean over its tokens of ln(corpus count of the token).

    Rare-token-heavy documents (garbled text, hash soup) score low; prose
    over a common vocabulary scores high — the CCNet language-model
    quality-filter shape (Wenzek et al. 2020) with corpus unigram
    frequencies standing in for the LM.  Empty docs carry the sentinel
    token (count 1 → ln 1) and score 0.

    Distributed: token explode → grouped counts (narrow (token, cnt)
    rows) → co-partitioned raw-task ``exchange_join`` of tokens to counts
    with the per-doc partial (Σ ln cnt, n) FUSED into the join reduce →
    one grouped sum → final divide.  NO broadcast vocabulary: at web
    scale the vocab is unbounded, so the lookup is a join, not a
    ``ray.put`` dict.
    """
    from dedup_ray.util.exchange import exchange_join

    # materialized: toks feeds both the count aggregate and the join's
    # left side — without it the tokenizer pass runs twice
    toks = tokenize_explode(ds, id_col=id_col, text_col=text_col).materialize()

    def cnt_col(batch: pa.Table) -> pa.Table:
        return pa.table({"token": batch["token"],
                         "cnt": pc.cast(batch["count()"], pa.float64())})

    counts = toks.groupby("token").count().map_batches(
        cnt_col, batch_format="pyarrow"
    )

    def partial(joined: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                id_col: joined[id_col].to_numpy(zero_copy_only=False),
                "lc": np.log(joined["cnt"].to_numpy(zero_copy_only=False)),
            }
        )
        g = df.groupby(id_col, sort=False).agg(
            s=("lc", "sum"), n=("lc", "size")
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    joined = exchange_join(
        toks, counts, on="token", num_partitions=num_partitions,
        post=partial,
    )

    def final(batch: pa.Table) -> pa.Table:
        s = batch["sum(s)"].to_numpy(zero_copy_only=False)
        n = batch["sum(n)"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: batch[id_col],
                "logfreq_score": pa.array(np.round(s / n, 6)),
            }
        )

    return (
        joined.groupby(id_col)
        .sum(["s", "n"])
        .map_batches(final, batch_format="pyarrow")
    )


# GPT-2-style pre-tokenizer, restricted to lookaround-free RE2 syntax so the
# Arrow kernel, Python re and DuckDB RE2 all agree match-for-match:
# contractions, optionally-space-prefixed letter runs / digit runs /
# punctuation runs; bare whitespace is not a token.
BPE_SPLIT_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_token_counts(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Per-doc token budget estimate: whitespace tokens + BPE-ish tokens.

    The BPE-ish count is the number of pre-tokenizer matches
    (``BPE_SPLIT_PATTERN``) — the unit an actual BPE would further merge,
    and the standard cheap stand-in for "how many LLM tokens is this
    document".  Pure vectorized Arrow (``count_substring_regex`` is
    RE2-backed, the same engine DuckDB uses, so the oracle is exact)."""

    def f(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        return pa.table(
            {
                id_col: batch[id_col],
                "n_ws_tokens": pc.cast(
                    pc.count_substring_regex(text, r"\S+"), pa.int64()
                ),
                "n_bpe_tokens": pc.cast(
                    pc.count_substring_regex(text, BPE_SPLIT_PATTERN), pa.int64()
                ),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


_PUNCT_RE = re.compile(r"[^\w\s]", re.U)
_WORD_RE = re.compile(r"\w+", re.U)


def quality_stats(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Per-doc quality features: n_chars, n_tokens, avg token len,
    stopword ratio (en), punct ratio.  Rounded to 6dp."""
    en_stop = STOPWORDS["en"]

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[text_col].fillna("")
        toks = texts.map(lambda t: t.split())
        n_tokens = toks.map(len)
        n_chars = texts.map(len)
        avg_len = [
            round(sum(len(w) for w in ws) / len(ws), 6) if ws else 0.0 for ws in toks
        ]
        stop_ratio = [
            round(sum(1 for w in ws if w.lower() in en_stop) / len(ws), 6)
            if ws
            else 0.0
            for ws in toks
        ]
        punct_ratio = [
            round(len(_PUNCT_RE.findall(t)) / len(t), 6) if len(t) else 0.0
            for t in texts
        ]
        return pd.DataFrame(
            {
                id_col: batch[id_col],
                "n_chars": n_chars.astype("int64"),
                "n_tokens": n_tokens.astype("int64"),
                "avg_token_len": avg_len,
                "stopword_ratio": stop_ratio,
                "punct_ratio": punct_ratio,
            }
        )

    return as_arrow(ds.map_batches(f, batch_format="pandas"))


class LangId:
    """Actor-pool language-ID: stopword-hit + CJK character heuristic.

    Deterministic; state (compiled regex, marker sets) built once per actor
    (ST2 template).  Decision rule (mirrored exactly by the SQL oracle):
    any CJK character → 'zh'; else count ``\\w+`` token hits per language
    marker set and take the max, ties broken by language-code ascending;
    zero hits everywhere → 'en'.  Vectorized: token explode + per-language
    ``isin`` + one grouped sum, no per-row Python loop.
    """

    def __init__(self) -> None:
        self.cjk = re.compile(r"[一-鿿]")
        self.langs = sorted(k for k, v in STOPWORDS.items() if v)
        self.markers = {k: STOPWORDS[k] for k in self.langs}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = pd.Series(batch.column("text").to_pylist()).fillna("")
        toks = texts.str.lower().str.findall(r"\w+")
        ex = toks.explode().dropna()
        hits = pd.DataFrame(0, index=texts.index, columns=self.langs,
                            dtype="int64")
        for lang in self.langs:
            h = ex[ex.isin(self.markers[lang])].groupby(level=0).size()
            hits.loc[h.index, lang] = h
        # idxmax picks the FIRST max column → ties resolve lang-ascending
        best = hits.idxmax(axis=1).where(hits.max(axis=1) > 0, "en")
        best = best.where(~texts.str.contains(self.cjk), "zh")
        return batch.append_column(
            "lang_pred", pa.array(best.tolist(), pa.string())
        )


def lang_id(ds, concurrency: int = 2, batch_size: int = 1024):
    return ds.map_batches(
        LangId, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )


def _winnow(values: np.ndarray, w: int) -> np.ndarray:
    """Winnowing selection (Schleimer et al., SIGMOD'03): per sliding window
    of ``w`` consecutive hashes take the min (leftmost on ties — the
    deterministic choice), dedup by selected position.  The leftmost-min
    position is non-decreasing as the window slides, so consecutive-position
    dedup is exact."""
    n = len(values)
    if n == 0:
        return values[:0]
    if n <= w:
        j = int(values.argmin())  # argmin (not .min): works for the md5
        return values[j:j + 1]    # hex-string dtype too
    sw = np.lib.stride_tricks.sliding_window_view(values, w)
    pos = sw.argmin(axis=1) + np.arange(len(sw))
    keep = np.ones(len(pos), dtype=bool)
    keep[1:] = pos[1:] != pos[:-1]
    return values[pos[keep]]


def fingerprint_docs(ds, id_col: str = "doc_id", text_col: str = "text",
                     shingle_k: int = 8, window: int = 4, seed: int = 42):
    """True winnowing fingerprints: (id, fingerprint) rows, several per doc.

    k-token shingle hashes → per-window-of-``window`` min with position
    dedup.  Guarantee: any shared token run of ≥ ``shingle_k + window - 1``
    tokens contributes at least one identical fingerprint to both docs, and
    a single token edit perturbs at most ``shingle_k + window - 1`` of a
    doc's windows — the rest of the fingerprint set is stable (property
    test in ``tests/test_ops.py``).
    """
    from dedup_ray.stages.shingle import shingle_hash_batch

    def f(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_pylist()
        values, offsets = shingle_hash_batch(texts, ids, shingle_k, seed)
        ids_out, fps = [], []
        for i, did in enumerate(ids):
            sel = _winnow(values[offsets[i] : offsets[i + 1]], window)
            ids_out.extend([did] * len(sel))
            fps.append(sel)
        flat = (
            np.concatenate(fps) if fps else np.empty(0, dtype=np.uint64)
        )
        return pa.table(
            {
                id_col: pa.array(ids_out),
                "fingerprint": pa.array(flat.view(np.int64)),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def fingerprint_docs_md5(ds, id_col: str = "doc_id", text_col: str = "text",
                         shingle_k: int = 8, window: int = 4):
    """Winnowing fingerprints over md5 shingle hashes — the ORACLE-SIDE
    twin of :func:`fingerprint_docs`.

    Same selection algorithm (leftmost-min per sliding window, position
    dedup), but the shingle hash is the first 16 hex chars of
    ``md5(shingle string)`` so any engine — including the DuckDB oracle —
    can recompute every fingerprint.  Fixed-width hex compares
    lexicographically exactly as the underlying uint64 compares, so the
    min is taken on the hex STRING on both sides.  The keyed-BLAKE2b
    variant stays the production path (adversary-resistant, no per-row
    Python md5); this one is the spec the oracle checks.

    Output: ``(id_col, fingerprint: 16-hex string)`` rows.
    """
    from dedup_ray.util.hashing import content_digest

    def f(batch: pa.Table) -> pa.Table:
        flat, parent, counts = explode_tokens(batch[text_col],
                                              batch.num_rows)
        ids = batch[id_col]
        toks = np.asarray(flat.to_pylist(), dtype=object)
        n = len(toks)
        k = shingle_k
        out_ids, out_fp = [], []
        if n >= 1:
            m = n - k + 1
            if m >= 1:
                sh = pd.Series(toks[:m], dtype=object)
                for j in range(1, k):
                    sh = sh + " " + pd.Series(toks[j:m + j], dtype=object)
                inside = parent[:m] == parent[k - 1:]
                sdoc = parent[:m][inside]
                dg = content_digest(list(sh.to_numpy()[inside]),
                                    algo="md5")
                hx = np.array([d[:16] for d in dg], dtype="<U16")
                # winnow per doc over its contiguous shingle slice
                first = np.r_[True, sdoc[1:] != sdoc[:-1]] \
                    if len(sdoc) else np.zeros(0, bool)
                starts = np.flatnonzero(first)
                bounds = np.r_[starts, len(sdoc)]
                for si in range(len(starts)):
                    lo, hi = bounds[si], bounds[si + 1]
                    sel = _winnow(hx[lo:hi], window)
                    did = ids[int(sdoc[lo])].as_py()
                    out_ids.extend([did] * len(sel))
                    out_fp.extend(sel.tolist())
        return pa.table({
            id_col: pa.array(out_ids, ids.type),
            "fingerprint": pa.array(out_fp, pa.string()),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def levenshtein_batch(a_list: list[str], b_list: list[str]) -> np.ndarray:
    """Exact edit distance for a batch of string pairs, vectorized ACROSS
    pairs: one two-row dynamic program over the padded max lengths, all
    pairs advanced in lockstep (numpy on the pair axis) — no per-pair
    Python loop.  O(n·La·Lb) cells like the scalar DP, but each cell
    step is one vectorized op over the whole batch.

    The classic record-linkage similarity (typo'd venue/author strings,
    near-identical product names) the token-set features miss; DuckDB's
    native ``levenshtein()`` is the oracle."""
    n = len(a_list)
    if n == 0:
        return np.zeros(0, np.int64)
    la = np.array([len(s) for s in a_list], np.int64)
    lb = np.array([len(s) for s in b_list], np.int64)
    La, Lb = int(la.max()), int(lb.max())
    # pad with pair-distinct sentinels (negative codes can't equal text)
    a = np.full((n, max(La, 1)), -1, np.int64)
    b = np.full((n, max(Lb, 1)), -2, np.int64)
    for i, s in enumerate(a_list):
        if s:
            a[i, : len(s)] = np.frombuffer(
                s.encode("utf-32-le"), np.uint32).astype(np.int64)
    for i, s in enumerate(b_list):
        if s:
            b[i, : len(s)] = np.frombuffer(
                s.encode("utf-32-le"), np.uint32).astype(np.int64)
    out = np.where(la == 0, lb, 0).astype(np.int64)
    prev = np.broadcast_to(np.arange(Lb + 1, dtype=np.int64),
                           (n, Lb + 1)).copy()
    rows = np.arange(n)
    for i in range(1, La + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        sub = (b != a[:, i - 1 : i]).astype(np.int64)  # (n, Lb)
        for j in range(1, Lb + 1):
            cur[:, j] = np.minimum(
                np.minimum(cur[:, j - 1] + 1, prev[:, j] + 1),
                prev[:, j - 1] + sub[:, j - 1],
            )
        done = la == i
        if done.any():
            out[done] = cur[rows[done], lb[done]]
        prev = cur
    return out


def token_entropy(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document Shannon entropy of the token distribution,
    ``H = ln(n) − (Σ_t c_t·ln c_t)/n`` over within-doc token counts — the
    repetition/diversity screen complementing the Gopher ratios: spam and
    template pages (few tokens repeated many times) score low, natural
    prose scores near ln(vocab-per-doc).

    Shuffle-free: a document's token histogram is batch-local, so the
    whole operator is ONE vectorized ``map_batches`` pass (factorize
    tokens, count (row, token) pairs via ``np.unique`` on packed codes,
    scatter-add Σ c·ln c per row).  Empty docs carry the sentinel token
    (``wordlist.py:24-27``) — a single-token doc has entropy exactly 0.
    Rounded to 6 decimals at the emit point (oracle hash parity).
    """

    def f(batch: pa.Table) -> pa.Table:
        m = batch.num_rows
        flat, parents, n = explode_tokens(batch[text_col], m)
        slc = np.zeros(m, np.float64)
        if len(parents):
            codes = pd.factorize(flat.to_numpy(zero_copy_only=False))[0]
            packed = parents.astype(np.int64) * (codes.max() + 1) + codes
            uniq, cnt = np.unique(packed, return_counts=True)
            rows = (uniq // (codes.max() + 1)).astype(np.int64)
            np.add.at(slc, rows, cnt * np.log(cnt))
        nf = n.astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            h = np.where(n > 0, np.log(np.maximum(nf, 1)) - slc / np.maximum(nf, 1), 0.0)
        return pa.table({
            id_col: batch[id_col],
            "token_entropy": pa.array(np.round(h, 6), pa.float64()),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def pmi_bigrams(ds, id_col: str = "doc_id", text_col: str = "text",
                min_count: int = 5, top_k: int = 50,
                num_partitions: int = 8):
    """Collocation mining: top-k adjacent-token bigrams by pointwise
    mutual information, ``PMI = ln(c12·N1² / (N2·c1·c2))`` over corpus
    bigram/unigram counts (Church & Hanks 1990) — the phrase-discovery
    pass of tokenizer/vocab prep (e.g. "new york" merges before BPE).

    Distributed shape: per-batch ``np.unique`` partials for unigrams AND
    bigrams (bounded by batch vocab, not corpus), one grouped-sum
    exchange each, the ``min_count`` filter BEFORE the two co-partitioned
    count joins (prune first — frequent bigrams are a vanishing fraction
    of distinct bigrams), then a bounded sort/limit.  Corpus totals are
    two driver scalars.  PMI is computed with one shared operand order
    and rounded to 6 decimals so the SQL oracle hashes identically.
    Bigrams never cross document boundaries.
    """
    from dedup_ray.util.exchange import exchange_group_apply, exchange_join

    def uni_partial(batch: pa.Table) -> pa.Table:
        flat, _p, _n = explode_tokens(batch[text_col], batch.num_rows)
        toks = flat.to_numpy(zero_copy_only=False)
        u, c = np.unique(toks, return_counts=True)
        return pa.table({"w": pa.array(u, pa.string()),
                         "c": pa.array(c, pa.int64())})

    def big_partial(batch: pa.Table) -> pa.Table:
        flat, parents, _n = explode_tokens(batch[text_col], batch.num_rows)
        toks = flat.to_numpy(zero_copy_only=False)
        if len(toks) < 2:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        same = parents[1:] == parents[:-1]
        df = pd.DataFrame({"w1": toks[:-1][same], "w2": toks[1:][same]})
        g = (df.groupby(["w1", "w2"], sort=False).size()
             .reset_index(name="c"))
        return pa.table({"w1": pa.array(g["w1"], pa.string()),
                         "w2": pa.array(g["w2"], pa.string()),
                         "c": pa.array(g["c"].to_numpy(), pa.int64())})

    def sum_counts(cols):
        def f(part: pa.Table) -> pa.Table:
            if part.num_rows == 0 or cols[0] not in part.column_names:
                return pa.table(
                    {c: pa.array([], pa.string()) for c in cols}
                    | {"c": pa.array([], pa.int64())})
            g = part.group_by(cols).aggregate([("c", "sum")])
            return g.rename_columns(cols + ["c"])
        return f

    uni = exchange_group_apply(
        ds.map_batches(uni_partial, batch_format="pyarrow"),
        "w", sum_counts(["w"]), num_partitions).materialize()
    big = exchange_group_apply(
        ds.map_batches(big_partial, batch_format="pyarrow"),
        ["w1", "w2"], sum_counts(["w1", "w2"]), num_partitions
    ).materialize()

    n1 = int(uni.sum("c") or 0)  # total tokens
    n2 = int(big.sum("c") or 0)  # total bigrams
    if n2 == 0:
        import ray.data as _rd
        return _rd.from_arrow(pa.table({
            "w1": pa.array([], pa.string()), "w2": pa.array([], pa.string()),
            "c": pa.array([], pa.int64()),
            "pmi": pa.array([], pa.float64())}))

    frequent = big.filter(expr=f"c >= {min_count}")

    c1 = uni.map_batches(
        lambda t: t.rename_columns(["w1", "c1"]), batch_format="pyarrow")
    c2 = uni.map_batches(
        lambda t: t.rename_columns(["w2", "c2"]), batch_format="pyarrow")
    j1 = exchange_join(frequent, c1, on="w1",
                       num_partitions=num_partitions)
    j2 = exchange_join(j1, c2, on="w2", num_partitions=num_partitions)

    def score(t: pa.Table) -> pa.Table:
        c12 = t["c"].to_numpy(zero_copy_only=False).astype(np.float64)
        a = t["c1"].to_numpy(zero_copy_only=False).astype(np.float64)
        b = t["c2"].to_numpy(zero_copy_only=False).astype(np.float64)
        # one shared operand order with the SQL oracle
        pmi = np.round(np.log((c12 * n1 * n1) / (float(n2) * a * b)), 6)
        return pa.table({"w1": t["w1"], "w2": t["w2"],
                         "c": t["c"],
                         "pmi": pa.array(pmi, pa.float64())})

    return (j2.map_batches(score, batch_format="pyarrow")
            .sort(["pmi", "w1", "w2"], descending=[True, False, False])
            .limit(top_k))


def json_extract_cols(ds, json_col: str, fields: dict,
                      keep_cols: list | None = None):
    """Schema-on-read JSON field extraction: pull typed columns out of a
    JSON string column (event ``props``, API payloads, WAT metadata) —
    the ingest-normalization step between raw logs and relational
    operators.  ``fields``: ``{out_name: (json_key, pa.DataType)}``;
    missing keys and nulls become typed nulls.

    Per-record ``json.loads`` (a C parser — the same bounded-per-record
    budget as the WARC/codec parsers; a malformed record becomes nulls,
    not a task failure).  Top-level keys only: nested paths belong to a
    real JSON engine, and a pipeline that needs them should flatten at
    ingest.
    """
    import json

    def f(t: pa.Table) -> pa.Table:
        vals = t[json_col].to_pylist()
        parsed = []
        for v in vals:
            try:
                p = json.loads(v) if v else {}
                parsed.append(p if isinstance(p, dict) else {})
            except (ValueError, TypeError):
                parsed.append({})
        cols = {}
        for c in (keep_cols or []):
            cols[c] = t[c]
        for out, (key, typ) in fields.items():
            cols[out] = pa.array([p.get(key) for p in parsed], typ,
                                 from_pandas=True)
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow")


def char_entropy(ds, id_col: str = "doc_id", text_col: str = "text",
                 low_threshold: float = 2.0):
    """Character-level Shannon entropy per document — the
    gibberish/repetition screen orthogonal to the token-level quality
    stats: natural prose sits ~4-4.5 bits/char, base64/hex blobs higher,
    repeated-template junk far lower.  ``low_flag`` marks docs under
    ``low_threshold`` bits.

    Computed as ``H = log2(n) - (Σ c·log2(c)) / n`` over per-character
    counts ``c`` — the same algebraic form the SQL oracle uses, so the
    only engine divergence is float summation order (absorbed by the
    4-decimal round).  Vectorized per batch: one codepoint histogram
    per doc via np.unique.  Shuffle-free.  Empty/null docs are skipped
    (no characters, no entropy).
    """
    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        texts = pc.cast(t[text_col], pa.large_string()).to_pylist()
        out_id, out_h = [], []
        for i, txt in zip(ids, texts):
            if not txt:
                continue
            cp = np.frombuffer(txt.encode("utf-32-le"), np.uint32)
            _, counts = np.unique(cp, return_counts=True)
            n = float(len(cp))
            h = np.log2(n) - float(
                (counts * np.log2(counts)).sum()) / n
            out_id.append(i)
            out_h.append(round(h, 4))
        flags = (np.array(out_h) < low_threshold).astype(np.int64) \
            if out_h else np.array([], np.int64)
        return pa.table({
            id_col: pa.array(out_id, t[id_col].type),
            "char_entropy": pa.array(out_h, pa.float64()),
            "low_flag": pa.array(flags, pa.int64()),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def vocab_growth(ds, bucket_docs: int = 50, id_col: str = "doc_id",
                 text_col: str = "text"):
    """Heaps-law vocabulary growth curve: distinct token types seen after
    each arrival bucket of ``bucket_docs`` documents (arrival order =
    ``doc_id``) — the corpus-audit companion to the Zipf rank fit and the
    crawl-saturation novelty curve.  A corpus whose ``cum_types`` curve
    flattens early is template-heavy; V(n) ≈ K·nᵝ with β ≈ 0.4–0.6 is
    healthy prose (Heaps 1978).

    Distributed: tokens via the M4 law (``tokenize_explode`` — empty docs
    contribute their sentinel, exactly as the IDF stack counts them); a
    token's FIRST bucket is one grouped min over narrow ``(token,
    min_doc)`` rows; per-bucket totals are one grouped count.  Only
    ≤ n_docs/bucket_docs curve rows reach the driver, which does the
    cumulative sums.  All integers — no cross-engine float drift
    anywhere.

    Output: ``(bucket, new_types, cum_types, bucket_tokens, cum_tokens)``.
    """
    toks = tokenize_explode(ds, id_col=id_col, text_col=text_col)
    toks = toks.materialize()  # feeds both aggregates

    first = toks.groupby("token").min(id_col)

    def first_bucket(t: pa.Table) -> pa.Table:
        mn = t[f"min({id_col})"].to_numpy(zero_copy_only=False)
        return pa.table({"bucket": pa.array(mn // bucket_docs, pa.int64())})

    nt = first.map_batches(first_bucket, batch_format="pyarrow") \
        .groupby("bucket").count().to_pandas()

    def tok_bucket(t: pa.Table) -> pa.Table:
        d = t[id_col].to_numpy(zero_copy_only=False)
        return pa.table({"bucket": pa.array(d // bucket_docs, pa.int64())})

    bt = toks.map_batches(tok_bucket, batch_format="pyarrow") \
        .groupby("bucket").count().to_pandas()

    bt = bt.rename(columns={"count()": "bucket_tokens"}).sort_values(
        "bucket")
    nt = nt.rename(columns={"count()": "new_types"})
    m = bt.merge(nt, on="bucket", how="left").fillna({"new_types": 0})
    m["new_types"] = m["new_types"].astype(np.int64)
    m["cum_types"] = m["new_types"].cumsum()
    m["cum_tokens"] = m["bucket_tokens"].cumsum()
    return pa.table({
        "bucket": pa.array(m["bucket"].to_numpy(), pa.int64()),
        "new_types": pa.array(m["new_types"].to_numpy(), pa.int64()),
        "cum_types": pa.array(m["cum_types"].to_numpy(), pa.int64()),
        "bucket_tokens": pa.array(
            m["bucket_tokens"].to_numpy(), pa.int64()),
        "cum_tokens": pa.array(m["cum_tokens"].to_numpy(), pa.int64()),
    })


# Unicode script ranges (BMP), shared verbatim with the generated SQL twin.
# Order matters twice: dominant-script ties resolve to the EARLIER entry,
# and the oracle's CASE chain is generated in the same order.
SCRIPT_RANGES: list[tuple[str, list[tuple[int, int]]]] = [
    ("latin", [(0x41, 0x5A), (0x61, 0x7A)]),
    ("cyrillic", [(0x400, 0x4FF)]),
    ("greek", [(0x370, 0x3FF)]),
    ("arabic", [(0x600, 0x6FF)]),
    ("cjk", [(0x4E00, 0x9FFF)]),
]


def script_profile(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document Unicode script profile — char counts per script class
    plus the dominant script: the writing-system router ahead of
    language-ID (langid's n-gram tables assume an alphabet; CJK / Arabic
    pages need different tokenizers entirely) and the standard
    mixed-script spam signal (Cyrillic lookalikes inside Latin text).

    Shuffle-free and vectorized: each batch decodes its text column ONCE
    to a flat UTF-32 codepoint array (one ``str.encode`` on the joined
    batch text, no per-char Python), counts range members per document
    with ``np.bincount`` scatters, and takes the dominant script by
    first-listed argmax; all-zero rows emit ``'none'``.  Integer counts
    only — nothing float-sensitive crosses engines.

    Output: ``(id_col, n_chars, <one count column per script>,
    dominant)``.
    """

    names = [n for n, _ in SCRIPT_RANGES]

    def f(t: pa.Table) -> pa.Table:
        texts = [x or "" for x in t[text_col].to_pylist()]
        n = len(texts)
        lens = np.array([len(x) for x in texts], dtype=np.int64)
        joined = "".join(texts)
        cp = np.frombuffer(joined.encode("utf-32-le"), np.uint32)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        counts = np.zeros((n, len(SCRIPT_RANGES)), dtype=np.int64)
        for k, (_, ranges) in enumerate(SCRIPT_RANGES):
            mask = np.zeros(len(cp), dtype=bool)
            for lo, hi in ranges:
                mask |= (cp >= lo) & (cp <= hi)
            if mask.any():
                counts[:, k] = np.bincount(doc_idx[mask], minlength=n)
        any_hit = counts.sum(axis=1) > 0
        dom_idx = counts.argmax(axis=1)  # ties -> first-listed script
        dom = np.where(any_hit, np.array(names, dtype=object)[dom_idx],
                       "none")
        cols = {id_col: t[id_col], "n_chars": pa.array(lens)}
        for k, name in enumerate(names):
            cols[name] = pa.array(counts[:, k])
        cols["dominant"] = pa.array(dom.tolist(), pa.string())
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow")


def script_profile_sql(text_expr: str) -> str:
    """Generated column expressions twin of :func:`script_profile` —
    returns the SELECT fragment ``n_chars, <counts>, dominant`` over
    ``text_expr`` (caller supplies FROM/id)."""
    def cls(ranges):
        body = "".join(
            rf"\x{{{lo:04X}}}-\x{{{hi:04X}}}" for lo, hi in ranges
        )
        return f"[{body}]"

    cnt_exprs = []
    for name, ranges in SCRIPT_RANGES:
        cnt_exprs.append(
            f"length({text_expr}) - length(regexp_replace({text_expr}, "
            f"'{cls(ranges)}', '', 'g')) AS {name}"
        )
    names = [n for n, _ in SCRIPT_RANGES]
    # CASE chain: first-listed script wins ties (>= against later entries,
    # > against earlier ones)
    chain = []
    for i, name in enumerate(names):
        conds = []
        for j, other in enumerate(names):
            if i == j:
                continue
            op = ">=" if j > i else ">"
            conds.append(f"{name} {op} {other}")
        chain.append(f"WHEN {' AND '.join(conds)} THEN '{name}'")
    zero = " AND ".join(f"{n} = 0" for n in names)
    dominant = (f"CASE WHEN {zero} THEN 'none' "
                + " ".join(chain) + " END AS dominant")
    return (f"length({text_expr})::BIGINT AS n_chars, "
            + ", ".join(cnt_exprs) + ", " + dominant)


def group_top_terms(ds, group_col: str, text_col: str = "text",
                    k: int = 3, n_groups: int | None = None,
                    num_partitions: int = 8, round_digits: int = 6):
    """Distinctive-term profile per group: the top-``k`` tokens of each
    group by ``tf_g(t) · ln(G / df(t))`` where ``df`` counts the groups
    containing the token and ``G`` is the group census — the classic
    host/site keyword profile (what distinguishes this host's vocabulary
    from the rest of the crawl).

    Two NARROW exchanges, both over pre-aggregated rows: per-batch
    ``(group, token, count)`` partials → token-keyed exchange (each
    token's group-df is complete inside its partition, so the idf
    attaches locally) → group-keyed exchange for the per-group top-k.
    Raw text never crosses a shuffle; moving volume is distinct
    (group, token) pairs.  Ties break by token asc, as the oracle's
    ``row_number`` does.  Output: ``(group_col, token, tf, score)``.
    """
    from dedup_ray.util.exchange import exchange_group_apply

    if n_groups is None:
        n_groups = len(ds.unique(group_col))
    g_f = float(n_groups)

    def partial(batch: pa.Table) -> pa.Table:
        grp = batch[group_col]
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        flat, parents, _ = explode_tokens(batch[text_col], batch.num_rows)
        t = pa.table({group_col: grp.take(pa.array(parents)),
                      "token": flat,
                      "one": pa.array(np.ones(len(flat), np.int64))})
        g = t.group_by([group_col, "token"]).aggregate([("one", "sum")])
        return g.rename_columns([group_col, "token", "tf"])

    def attach_df(part: pa.Table) -> pa.Table:
        if part.num_rows == 0 or "token" not in part.column_names:
            return pa.table({
                group_col: pa.array([], pa.int64()),
                "token": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
                "df": pa.array([], pa.int64()),
            })
        g = part.group_by([group_col, "token"]).aggregate([("tf", "sum")])
        g = g.rename_columns([group_col, "token", "tf"])
        df_tbl = g.group_by("token").aggregate([([], "count_all")])
        df_tbl = df_tbl.rename_columns(["token", "df"])
        return g.join(df_tbl, keys="token", join_type="inner")

    def topk(part: pa.Table) -> pa.Table:
        empty = pa.table({
            group_col: pa.array([], pa.int64()),
            "token": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
        })
        if part.num_rows == 0 or "token" not in part.column_names:
            return empty
        df = part.to_pandas()
        df["score"] = df["tf"].to_numpy(dtype=np.float64) * np.log(
            g_f / df["df"].to_numpy(dtype=np.float64))
        df = df.sort_values([group_col, "score", "token"],
                            ascending=[True, False, True], kind="stable")
        df = df.groupby(group_col, sort=False).head(k)
        return pa.table({
            group_col: pa.array(df[group_col].to_numpy(),
                                part[group_col].type),
            "token": pa.array(df["token"].to_numpy(), pa.string()),
            "tf": pa.array(df["tf"].to_numpy(dtype=np.int64), pa.int64()),
            "score": pa.array(np.round(df["score"].to_numpy(),
                                       round_digits), pa.float64()),
        })

    tf = exchange_group_apply(
        ds.map_batches(partial, batch_format="pyarrow"),
        "token", attach_df, num_partitions)
    return exchange_group_apply(tf, group_col, topk, num_partitions)


def textrank_keywords(ds, id_col: str = "doc_id", text_col: str = "text",
                      top_k: int = 15, damping: float = 0.85,
                      iterations: int = 8, num_partitions: int = 8):
    """TextRank keyword extraction (Mihalcea & Tarau 2004): weighted
    PageRank over the token CO-OCCURRENCE graph (adjacent-token pairs,
    window 2, undirected, weight = corpus pair count), ``WS(v) = (1−d) +
    d·Σ_u w_uv/W_u·WS(u)`` run a FIXED ``iterations`` rounds from
    WS=1 — both the kernel and the SQL twin unroll the same count, so
    convergence is never assumed.

    Scale shape: the corpus pass is one vectorized pair-extraction
    ``map_batches`` + one (w1,w2)-keyed count exchange; the graph that
    reaches the single reduce task is VOCAB²-bounded (never corpus-
    sized) — the same central-state license as the Zipf fit and the
    IDF broadcast.  Output: ``(token, rank)`` top-``top_k`` by
    (rank@6dp DESC, token ASC) — the tie rule is part of the contract.
    """
    from dedup_ray.util.exchange import exchange_group_apply

    def pairs(t: pa.Table) -> pa.Table:
        flat, parents, n = explode_tokens(t[text_col], t.num_rows)
        toks = np.asarray(flat.to_pylist(), dtype=object)
        par = np.asarray(parents, dtype=np.int64)
        if len(toks) < 2:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        adj = par[1:] == par[:-1]
        x, y = toks[:-1][adj], toks[1:][adj]
        keep = x != y
        x, y = x[keep], y[keep]
        lo = np.where(x < y, x, y)  # object dtype: elementwise str compare
        hi = np.where(x < y, y, x)
        df = pd.DataFrame({"w1": lo, "w2": hi})
        g = df.groupby(["w1", "w2"], sort=False).size().reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    def fold(part: pa.Table) -> pa.Table:
        g = part.group_by(["w1", "w2"]).aggregate([("n", "sum")])
        return g.rename_columns(["w1", "w2", "n"])

    edges = exchange_group_apply(
        ds.map_batches(pairs, batch_format="pyarrow"), ["w1", "w2"], fold,
        num_partitions,
        empty_schema=pa.schema([("w1", pa.string()), ("w2", pa.string()),
                                ("n", pa.int64())]),
    )

    out_schema = pa.schema([("token", pa.string()), ("rank", pa.float64())])

    def pagerank_reduce(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas()
        und = pd.concat([
            df.rename(columns={"w1": "u", "w2": "v"}),
            df.rename(columns={"w2": "u", "w1": "v"}),
        ], ignore_index=True)
        vocab, u_idx = np.unique(und["u"].to_numpy(), return_inverse=True)
        v_idx = np.searchsorted(vocab, und["v"].to_numpy())
        w = und["n"].to_numpy(dtype=np.float64)
        wu = np.zeros(len(vocab))
        np.add.at(wu, u_idx, w)
        frac = w / wu[u_idx]
        r = np.ones(len(vocab))
        for _ in range(iterations):
            nxt = np.zeros(len(vocab))
            np.add.at(nxt, v_idx, frac * r[u_idx])
            r = (1.0 - damping) + damping * nxt
        r = np.round(r, 6)
        order = np.lexsort((vocab, -r))[:top_k]
        return pa.table({"token": pa.array(vocab[order], pa.string()),
                         "rank": pa.array(r[order], pa.float64())})

    return exchange_group_apply(
        edges, ["w1"], pagerank_reduce, num_partitions=1,
        empty_schema=pa.schema([("w1", pa.string()), ("w2", pa.string()),
                                ("n", pa.int64())]),
    )


def token_class_association(ds, label_col: str = "lang",
                            id_col: str = "doc_id", text_col: str = "text",
                            target: str | None = None, top_k: int = 20,
                            num_partitions: int = 8):
    """Token–class association ranking by BOTH mutual information and
    Dunning's log-likelihood G² (Dunning 1993, "Accurate Methods for
    the Statistics of Surprise and Coincidence") over document-level
    token PRESENCE: for each token, the 2×2 grid (docs containing it vs
    not × target class vs rest) scores how diagnostic the token is of
    ``target`` (default: the most common label, resolved
    deterministically by (count DESC, label ASC)).

    The feature-selection / keyness pass of a corpus study: MI finds
    informative tokens, G² is the significance-calibrated variant that
    does not overweight rare tokens.  One (token, label) presence-count
    exchange (vocab×classes-bounded), then a single reduce computes
    both scores from the same grid.  Output: top-``top_k`` by
    (g2@6dp DESC, token ASC) with columns ``(token, n_target, n_rest,
    mi, g2)``.  All four grid cells use +0.5 smoothing so empty cells
    never produce log(0) — mirrored exactly in SQL."""
    from dedup_ray.util.exchange import exchange_group_apply

    def presence_partial(t: pa.Table) -> pa.Table:
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        flat, parents, n = explode_tokens(t[text_col], t.num_rows)
        labels = t[label_col]
        if isinstance(labels, pa.ChunkedArray):
            labels = labels.combine_chunks()
        df = pd.DataFrame({
            "doc": ids.take(pa.array(parents)).to_pylist(),
            "token": flat.to_pylist(),
            "label": labels.take(pa.array(parents)).to_pylist(),
        }).drop_duplicates(subset=["doc", "token"])
        g = df.groupby(["token", "label"], sort=False).size() \
              .reset_index(name="c")
        return pa.Table.from_pandas(g, preserve_index=False)

    def fold(part: pa.Table) -> pa.Table:
        g = part.group_by(["token", "label"]).aggregate([("c", "sum")])
        return g.rename_columns(["token", "label", "c"])

    counts = exchange_group_apply(
        ds.map_batches(presence_partial, batch_format="pyarrow"),
        ["token"], fold, num_partitions,
        empty_schema=pa.schema([("token", pa.string()),
                                ("label", pa.string()),
                                ("c", pa.int64())]),
    )

    from ray.data.aggregate import Count

    ndocs = ds.groupby(label_col).aggregate(
        Count(alias_name="nd")).to_pandas()
    if target is None:
        ndocs = ndocs.sort_values(["nd", label_col],
                                  ascending=[False, True])
        target_label = ndocs[label_col].iloc[0]
    else:
        target_label = target
    n_t = int(ndocs.set_index(label_col)["nd"].loc[target_label])
    n_r = int(ndocs["nd"].sum()) - n_t

    out_schema = pa.schema([("token", pa.string()),
                            ("n_target", pa.int64()),
                            ("n_rest", pa.int64()),
                            ("mi", pa.float64()), ("g2", pa.float64())])

    def reduce_fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas()
        df["is_t"] = (df["label"] == target_label)
        piv = df.pivot_table(index="token", columns="is_t", values="c",
                             aggfunc="sum", fill_value=0).sort_index()
        g = pd.DataFrame({
            "token": piv.index,
            "a": piv[True].to_numpy() if True in piv.columns
                 else np.zeros(len(piv), np.int64),
            "b": piv[False].to_numpy() if False in piv.columns
                 else np.zeros(len(piv), np.int64),
        })
        a = g["a"].to_numpy(dtype=np.float64)      # target docs WITH token
        b = g["b"].to_numpy(dtype=np.float64)      # rest docs WITH token
        cells = np.stack([a, b, n_t - a, n_r - b], axis=1) + 0.5
        tot = cells.sum(axis=1, keepdims=True)
        rows = cells[:, [0, 1]].sum(1, keepdims=True)  # with-token mass
        cols = cells[:, [0, 2]].sum(1, keepdims=True)  # target mass
        exp = np.stack([
            rows[:, 0] * cols[:, 0], rows[:, 0] * (tot[:, 0] - cols[:, 0]),
            (tot[:, 0] - rows[:, 0]) * cols[:, 0],
            (tot[:, 0] - rows[:, 0]) * (tot[:, 0] - cols[:, 0]),
        ], axis=1) / tot
        ratio = cells / exp
        g2 = np.round(2.0 * (cells * np.log(ratio)).sum(axis=1), 6)
        mi = np.round(((cells / tot) * np.log(ratio)).sum(axis=1), 6)
        order = np.lexsort((g["token"].to_numpy(), -g2))[:top_k]
        return pa.table({
            "token": pa.array(g["token"].to_numpy()[order], pa.string()),
            "n_target": pa.array(a[order].astype(np.int64), pa.int64()),
            "n_rest": pa.array(b[order].astype(np.int64), pa.int64()),
            "mi": pa.array(mi[order], pa.float64()),
            "g2": pa.array(g2[order], pa.float64()),
        })

    return exchange_group_apply(
        counts, ["token"], reduce_fn, num_partitions=1,
        empty_schema=pa.schema([("token", pa.string()),
                                ("label", pa.string()),
                                ("c", pa.int64())]),
    )


def self_bleu_probe(ds, probe_ids: list[int], id_col: str = "doc_id",
                    text_col: str = "text", num_partitions: int = 16):
    """Self-BLEU-2 diversity probe (Zhu et al. 2018, Texygen): for each
    probe document, the clipped unigram/bigram precision of its text
    against the REST of the corpus as references — the corpus-level
    "is everything saying the same thing" audit (high self-BLEU =
    template flood / mode collapse; the generation-diversity metric
    applied to curation).

    Clipping against "all other docs" needs only each gram's TOP-2
    per-doc counts (max over refs = the global max, or the runner-up
    when the probe doc itself holds the max — ties make the choice
    value-irrelevant): ONE gram-keyed exchange folds (top1 doc, top1
    count, top2 count) per gram, the probe docs' gram rows semi-join
    against it (probe set is bounded/broadcast), and per-probe sums are
    integers — ``p_n = Σ min(c, maxref) / Σ c``.  Reported score =
    ``sqrt(p1 · p2)`` (BLEU-2 geometric mean, smoothing-free: a zero
    precision reports 0).

    Output: ``(id_col, p1, p2, self_bleu2)`` rounded 6dp.
    """
    import ray

    from dedup_ray.util.exchange import exchange_group_apply

    probe = set(int(x) for x in probe_ids)

    def grams(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        texts = t[text_col].to_pylist()
        oid, og, on = [], [], []
        for did, tx in zip(ids.tolist(), texts):
            toks = [w for w in (tx or "").split(" ") if w]
            c1: dict = {}
            for w in toks:
                c1[w] = c1.get(w, 0) + 1
            c2: dict = {}
            for a, b in zip(toks, toks[1:]):
                g = f"{a} {b}"
                c2[g] = c2.get(g, 0) + 1
            for g, c in c1.items():
                oid.append(did)
                og.append(f"1\x1f{g}")
                on.append(c)
            for g, c in c2.items():
                oid.append(did)
                og.append(f"2\x1f{g}")
                on.append(c)
        return pa.table({id_col: pa.array(oid, pa.int64()),
                         "gram": pa.array(og, pa.string()),
                         "c": pa.array(on, pa.int64())})

    gtab = ds.map_batches(grams, batch_format="pyarrow")

    top_schema = pa.schema([("gram", pa.string()),
                            ("top1_doc", pa.int64()),
                            ("top1_c", pa.int64()),
                            ("top2_c", pa.int64())])

    def top2(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return top_schema.empty_table()
        df = t.to_pandas().sort_values(
            ["gram", "c", id_col], ascending=[True, False, True])
        g1 = df.drop_duplicates("gram")
        rest = df[~df.index.isin(g1.index)].drop_duplicates("gram")
        out = g1.merge(rest[["gram", "c"]], on="gram", how="left",
                       suffixes=("", "_2"))
        return pa.table({
            "gram": pa.array(out["gram"], pa.string()),
            "top1_doc": pa.array(out[id_col].to_numpy(), pa.int64()),
            "top1_c": pa.array(out["c"].to_numpy(), pa.int64()),
            "top2_c": pa.array(
                out["c_2"].fillna(0).to_numpy().astype(np.int64)),
        })

    tops = exchange_group_apply(
        gtab, ["gram"], top2, num_partitions,
        empty_schema=pa.schema([(id_col, pa.int64()),
                                ("gram", pa.string()),
                                ("c", pa.int64())]),
    )

    def probe_rows(t: pa.Table) -> pa.Table:
        keep = pa.array([int(v) in probe
                         for v in t[id_col].to_pylist()])
        return t.filter(keep)

    pg = gtab.map_batches(probe_rows, batch_format="pyarrow")

    from dedup_ray.util.exchange import exchange_join

    j = exchange_join(
        pg, tops, on="gram", how="inner",
        num_partitions=num_partitions,
        empty_schema=pa.schema([(id_col, pa.int64()),
                                ("gram", pa.string()),
                                ("c", pa.int64()),
                                ("top1_doc", pa.int64()),
                                ("top1_c", pa.int64()),
                                ("top2_c", pa.int64())]),
    ).to_pandas()

    rows = {"id": [], "p1": [], "p2": [], "sb": []}
    if j.empty:  # empty corpus: Ray drops columns at 0 rows
        j = pd.DataFrame({id_col: [], "gram": [], "c": [],
                          "top1_doc": [], "top1_c": [], "top2_c": []})
    for did in sorted(probe):
        sub = j[j[id_col] == did]
        if sub.empty:
            continue
        ps = {}
        for n in ("1", "2"):
            s = sub[sub["gram"].str.startswith(n + "\x1f")]
            if s.empty:
                ps[n] = None
                continue
            maxref = np.where(s["top1_doc"].to_numpy() == did,
                              s["top2_c"].to_numpy(),
                              s["top1_c"].to_numpy())
            num = int(np.minimum(s["c"].to_numpy(), maxref).sum())
            den = int(s["c"].sum())
            ps[n] = (num, den)
        if ps["1"] is None:
            continue
        p1 = ps["1"][0] / ps["1"][1]
        p2 = (ps["2"][0] / ps["2"][1]) if ps["2"] else 0.0
        rows["id"].append(did)
        rows["p1"].append(round(p1, 6))
        rows["p2"].append(round(p2, 6))
        rows["sb"].append(round(float(np.sqrt(p1 * p2)), 6))
    return pa.table({
        id_col: pa.array(rows["id"], pa.int64()),
        "p1": pa.array(rows["p1"], pa.float64()),
        "p2": pa.array(rows["p2"], pa.float64()),
        "self_bleu2": pa.array(rows["sb"], pa.float64()),
    })
