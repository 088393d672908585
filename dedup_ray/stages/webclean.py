"""Web-corpus cleaning operators: line-level exact dedup, PII redaction,
repetition/quality screening, and benchmark decontamination.

These are the standard passes of a public web-text curation pipeline
(C4-style line dedup, Gopher-style repetition rules, n-gram test-set
decontamination) applied on top of the engine's document model — the same
normalize-before-compare doctrine as the reference's key cleaners
(``venue_author_preprocess.R:17-28``, ``venue_bag.py:11-15``), lifted from record keys
to document *content*.

Design notes (100-TB posture):

- Line explode is a pure ``map_batches`` (no shuffle); the global
  line-dedup is ONE int64-keyed hash exchange where the partition key is a
  64-bit line hash (vectorized splitmix path through
  ``exchange._key_hash``) while the within-partition group key is the line
  STRING — hash collisions cost a partition co-location, never a wrong
  merge.
- PII rules are RE2-safe and drive both the Arrow kernel and a generated
  DuckDB oracle (the ``urlnorm.py`` trick), so the spec cannot drift from
  its check.
- Quality metrics need no shuffle at all: every per-document statistic is
  computed inside the batch with ``np.add.reduceat``/run-length scans over
  the flattened token array.
- Decontamination broadcasts the benchmark-side gram-hash set once via
  ``ray.put`` (benchmark sets are small by construction); the training
  sweep is an ``np.isin`` per batch.  64-bit gram-hash collisions can only
  ADD a flagged gram (never hide one) with probability ~n²/2⁶⁴.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from dedup_ray.util.hashing import mix64, stable64_array

# --------------------------------------------------------------------------
# Line-level exact dedup (C4-style: a boilerplate line kept only at its
# globally-first occurrence)
# --------------------------------------------------------------------------

LINE_WIDTH = 12  # whitespace tokens per "line" (fixed window; last is short)


def _text_col(t: pa.Table, col: str) -> pa.Array:
    """Text column with the engine's null policy applied: null text == ""
    (a crawler row with no extracted text is an empty page, not a crash).
    Also flattens chunked columns once for the kernels below."""
    arr = t[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pc.coalesce(arr, pa.scalar("", arr.type))


def explode_token_lines(ds, text_col: str = "text", id_col: str = "doc_id",
                        width: int = LINE_WIDTH,
                        carry_cols: list[str] | None = None):
    """Explode documents into fixed-width token lines.

    A "line" is ``width`` consecutive whitespace tokens joined by a single
    space (the last line of a document may be shorter).  Output columns:
    ``(id_col, line_no, line, line_h)`` where ``line_h`` is a 64-bit hash
    of the line used as the dedup shuffle key.  ``carry_cols`` replicate
    onto every line of their document (e.g. the host column for per-host
    boilerplate removal).

    Vectorized: one ``split_pattern`` per batch, then one
    ``list_slice``+``binary_join`` pass per line INDEX (loop count =
    max lines in any batch document — bounded by document length, not
    batch size; every pass covers all documents at once).
    """
    carry = carry_cols or []

    def f(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(_text_col(t, text_col), " ")
        nlines = pc.cast(
            pc.ceil(pc.divide(pc.cast(pc.list_value_length(toks), pa.float64()),
                              float(width))),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        max_lines = int(nlines.max()) if len(nlines) else 0
        idx_parts, no_parts, line_parts = [], [], []
        for k in range(max_lines):
            live = nlines > k
            if not live.any():
                break
            sub = pc.binary_join(
                pc.list_slice(toks, k * width, (k + 1) * width), " "
            ).to_numpy(zero_copy_only=False)
            idx_parts.append(np.flatnonzero(live))
            no_parts.append(np.full(int(live.sum()), k, np.int64))
            line_parts.append(sub[live])
        if not idx_parts:
            cols = {
                id_col: pa.array([], t[id_col].type),
                "line_no": pa.array([], pa.int64()),
                "line": pa.array([], pa.string()),
                "line_h": pa.array([], pa.int64()),
            }
            for c in carry:
                cols[c] = pa.array([], t[c].type)
            return pa.table(cols)
        lines = np.concatenate(line_parts)
        h = stable64_array(list(lines), seed=0x11E5).view(np.int64)
        sel = pa.array(np.concatenate(idx_parts))
        cols = {
            id_col: t[id_col].take(sel),
            "line_no": pa.array(np.concatenate(no_parts)),
            "line": pa.array(lines, pa.string()),
            "line_h": pa.array(h),
        }
        for c in carry:
            cols[c] = t[c].take(sel)
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow")


def line_dedup(ds_lines, id_col: str = "doc_id", num_partitions: int = 16):
    """Keep each distinct line only at its first occurrence — minimum
    ``(doc_id, line_no)`` over all occurrences of the identical line text.

    One exchange keyed on the int64 ``line_h``; inside a partition the
    group key is the line STRING (lexsort + boundary scan), so a hash
    collision merely co-locates two different lines.
    """
    from dedup_ray.util.exchange import exchange_group_apply

    def keep_first(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:  # exchange void blocks carry no schema
            id_type = part[id_col].type if id_col in part.column_names \
                else pa.int64()
            return pa.table({
                id_col: pa.array([], id_type),
                "line_no": pa.array([], pa.int64()),
                "line": pa.array([], pa.string()),
            })
        line = np.asarray(part["line"].to_pylist(), dtype=object)
        ids = part[id_col].to_numpy(zero_copy_only=False)
        nos = part["line_no"].to_numpy(zero_copy_only=False)
        order = np.lexsort((nos, ids, line))
        first = np.r_[True, line[order][1:] != line[order][:-1]] \
            if len(order) else np.zeros(0, bool)
        keep = part.take(pa.array(order[np.flatnonzero(first)]))
        return keep.select([id_col, "line_no", "line"])

    return exchange_group_apply(ds_lines, "line_h", keep_first, num_partitions)


def reassemble_docs(kept_lines, id_col: str = "doc_id",
                    num_partitions: int = 16):
    """Rebuild document text from surviving lines (post :func:`line_dedup`):
    one exchange on the document id, then a vectorized in-partition join —
    lines sorted by ``line_no``, doc boundaries found by scan, and the
    per-doc concat done with ``ListArray`` offsets + ``binary_join`` (no
    per-doc Python).  Output: ``(id_col, text)``."""
    from dedup_ray.util.exchange import exchange_group_apply

    def join_lines(part: pa.Table) -> pa.Table:
        id_type = part[id_col].type if id_col in part.column_names \
            else pa.int64()
        if part.num_rows == 0:
            return pa.table({
                id_col: pa.array([], id_type),
                "text": pa.array([], pa.string()),
            })
        ids = part[id_col].to_numpy(zero_copy_only=False)
        nos = part["line_no"].to_numpy(zero_copy_only=False)
        order = np.lexsort((nos, ids))
        lines = part["line"].combine_chunks() if isinstance(
            part["line"], pa.ChunkedArray) else part["line"]
        lines_s = lines.take(pa.array(order))
        ids_s = ids[order]
        first = np.r_[True, ids_s[1:] != ids_s[:-1]]
        starts = np.flatnonzero(first)
        # int64 offsets + LargeList: a partition can legitimately hold
        # >2^31 line rows at the module's stated scale
        offsets = pa.array(np.r_[starts, len(ids_s)].astype(np.int64))
        joined = pc.binary_join(
            pa.LargeListArray.from_arrays(offsets, lines_s), " "
        )
        return pa.table({
            id_col: pa.array(ids_s[starts], id_type),
            "text": joined,
        })

    return exchange_group_apply(kept_lines, id_col, join_lines,
                                num_partitions)


def host_boilerplate_lines(ds_lines, min_docs: int = 3,
                           id_col: str = "doc_id",
                           host_col: str = "host",
                           num_partitions: int = 16):
    """Per-host boilerplate removal (RefinedWeb/CCNet doctrine): a line
    whose identical text occurs in at least ``min_docs`` DISTINCT documents
    of the same host is site furniture (nav bars, footers, cookie banners)
    and is dropped from EVERY document of that host — unlike
    :func:`line_dedup`, which keeps the globally-first occurrence.

    One exchange keyed on the int64 ``line_h`` (all occurrences of a line
    co-locate regardless of host); inside a partition the group key is
    ``(host, line)`` strings, so hash collisions never merge groups.  The
    per-group distinct-document count is a sorted boundary scan +
    ``reduceat`` — no per-group Python.  Skew bound: the hottest group is
    one host's hottest line, bounded by pages-per-host (see
    ``cap_per_host_docs`` for the upstream guard).
    """
    from dedup_ray.util.exchange import exchange_group_apply

    def drop_frequent(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            id_type = part[id_col].type if id_col in part.column_names \
                else pa.int64()
            return pa.table({
                id_col: pa.array([], id_type),
                "line_no": pa.array([], pa.int64()),
                "line": pa.array([], pa.string()),
            })
        host = np.asarray(part[host_col].to_pylist(), dtype=object)
        line = np.asarray(part["line"].to_pylist(), dtype=object)
        ids = part[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, line, host))
        h_s, l_s, id_s = host[order], line[order], ids[order]
        new_grp = np.r_[True, (h_s[1:] != h_s[:-1]) | (l_s[1:] != l_s[:-1])]
        # distinct docs per group: rows are sorted by id within a group,
        # so a distinct doc starts where the group starts or the id changes
        new_doc = new_grp | np.r_[True, id_s[1:] != id_s[:-1]]
        starts = np.flatnonzero(new_grp)
        df = np.add.reduceat(new_doc.astype(np.int64), starts)
        keep_grp = df < min_docs
        grp_of_row = np.cumsum(new_grp) - 1
        keep = np.zeros(len(order), bool)
        keep[order] = keep_grp[grp_of_row]
        return part.filter(pa.array(keep)).select(
            [id_col, "line_no", "line"])

    return exchange_group_apply(ds_lines, "line_h", drop_frequent,
                                num_partitions)


def host_boilerplate_removal(ds, min_docs: int = 3, text_col: str = "text",
                             id_col: str = "doc_id", host_col: str = "host",
                             num_partitions: int = 16):
    """End-to-end per-host boilerplate scrub: explode fixed-width token
    lines carrying the host column, drop per-host frequent lines, rebuild
    each document's text.  Documents whose every line was boilerplate
    vanish from the output (an all-furniture page has no content).
    Output: ``(id_col, text)``."""
    lines = explode_token_lines(ds, text_col=text_col, id_col=id_col,
                                carry_cols=[host_col])
    kept = host_boilerplate_lines(lines, min_docs=min_docs, id_col=id_col,
                                  host_col=host_col,
                                  num_partitions=num_partitions)
    return reassemble_docs(kept, id_col=id_col,
                           num_partitions=num_partitions)


def intradoc_line_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                        width: int = LINE_WIDTH):
    """Within-document repeated-line removal (the Gopher "duplicate
    paragraph" screen at line granularity): a line occurring more than
    once INSIDE one document keeps only its first occurrence; other
    documents are irrelevant.  Because the unit of repetition never
    crosses a document, this is a pure ``map_batches`` — zero shuffles,
    the cheapest member of the line-dedup family (global:
    :func:`line_dedup`; per-host: :func:`host_boilerplate_lines`).

    Vectorized: the explode loop of :func:`explode_token_lines`, then ONE
    lexsort + boundary scan for first-occurrence selection and ONE
    offsets+``binary_join`` pass for reassembly — no per-document Python.
    Output: ``(id_col, text)`` with every document present (a document
    with no repeats round-trips unchanged).
    """

    def f(t: pa.Table) -> pa.Table:
        texts = _text_col(t, text_col)
        toks = pc.split_pattern(texts, " ")
        nlines = pc.cast(
            pc.ceil(pc.divide(pc.cast(pc.list_value_length(toks),
                                      pa.float64()), float(width))),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        max_lines = int(nlines.max()) if len(nlines) else 0
        idx_parts, no_parts, line_parts = [], [], []
        for k in range(max_lines):
            live = nlines > k
            if not live.any():
                break
            sub = pc.binary_join(
                pc.list_slice(toks, k * width, (k + 1) * width), " "
            ).to_numpy(zero_copy_only=False)
            idx_parts.append(np.flatnonzero(live))
            no_parts.append(np.full(int(live.sum()), k, np.int64))
            line_parts.append(sub[live])
        if not idx_parts:
            return pa.table({
                id_col: pa.array([], t[id_col].type),
                "text": pa.array([], pa.string()),
            })
        row = np.concatenate(idx_parts)
        no = np.concatenate(no_parts)
        lines = np.concatenate(line_parts)
        # first occurrence per (doc, line): sort (row, line, line_no),
        # keep group heads — heads carry the MIN line_no of their group
        order = np.lexsort((no, lines, row))
        r_s, l_s = row[order], lines[order]
        first = np.r_[True, (r_s[1:] != r_s[:-1]) | (l_s[1:] != l_s[:-1])]
        keep = order[first]
        # reassemble kept lines in original line order per doc
        kr, kn, kl = row[keep], no[keep], lines[keep]
        order2 = np.lexsort((kn, kr))
        kr, kl = kr[order2], kl[order2]
        starts = np.flatnonzero(np.r_[True, kr[1:] != kr[:-1]])
        offsets = pa.array(np.r_[starts, len(kr)].astype(np.int64))
        joined = pc.binary_join(
            pa.LargeListArray.from_arrays(offsets, pa.array(kl, pa.string())),
            " ",
        )
        return pa.table({
            id_col: t[id_col].take(pa.array(kr[starts])),
            "text": joined,
        })

    return ds.map_batches(f, batch_format="pyarrow")


# --------------------------------------------------------------------------
# PII redaction (RE2 rule list shared verbatim with the DuckDB oracle)
# --------------------------------------------------------------------------

# (name, pattern, replacement) applied IN ORDER with global replace; each
# rule's count is taken on the text as that rule sees it (post prior rules).
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone",
     r"\+\d{1,2}-\d{3}-\d{3}-\d{4}|\(\d{3}\) \d{3}-\d{4}|\b\d{3}-\d{3}-\d{4}\b",
     "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def redact_pii_arrays(texts: pa.Array) -> tuple[pa.Array, dict[str, pa.Array]]:
    """Vectorized redaction; returns (clean_text, {rule_name: count})."""
    out = texts
    counts: dict[str, pa.Array] = {}
    for name, pat, repl in PII_RULES:
        counts[f"n_{name}"] = pc.cast(
            pc.count_substring_regex(out, pat), pa.int64()
        )
        out = pc.replace_substring_regex(out, pat, replacement=repl)
    return out, counts


def redact_pii(ds, text_col: str = "text", out_col: str = "clean"):
    """Dataset stage: append redacted text + per-category counts."""

    def f(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        clean, counts = redact_pii_arrays(texts)
        t = t.append_column(out_col, clean)
        for name, arr in counts.items():
            t = t.append_column(name, arr)
        return t

    return ds.map_batches(f, batch_format="pyarrow")


def pii_oracle_exprs(col: str) -> tuple[str, dict[str, str]]:
    """DuckDB (clean_expr, {count_name: count_expr}) generated from the SAME
    rule list as the Arrow kernel — rule order and all."""

    def esc(p: str) -> str:
        return p.replace("'", "''")

    expr = col
    counts: dict[str, str] = {}
    for name, pat, repl in PII_RULES:
        counts[f"n_{name}"] = (
            f"len(regexp_extract_all({expr}, '{esc(pat)}'))"
        )
        expr = f"regexp_replace({expr}, '{esc(pat)}', '{repl}', 'g')"
    return expr, counts


# --------------------------------------------------------------------------
# Repetition / quality screen (Gopher-style rules over token statistics)
# --------------------------------------------------------------------------

QUALITY_BOUNDS = {
    "min_words": 5,
    "max_words": 10_000,
    "max_dup_2gram_frac": 0.40,
    "max_top_token_frac": 0.25,
    "min_mean_word_len": 2.0,
    "max_mean_word_len": 12.0,
}


def repetition_quality(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document repetition/quality metrics + keep flag; no shuffle.

    Metrics (all computed inside the batch over the flattened token array):
    ``n_words``; ``mean_word_len``; ``dup_2gram_frac`` — fraction of word
    2-gram occurrences beyond the first occurrence of that 2-gram within
    the document (0 when fewer than 2 tokens); ``top_token_frac`` — share
    of the most frequent token; ``keep`` — 1 iff every metric is inside
    ``QUALITY_BOUNDS``.  Token identity is a 64-bit hash (collisions can
    only over-count repetition, never under-count).
    """
    f = _quality_batch_fn(text_col, id_col, emit_metrics=True)
    return ds.map_batches(f, batch_format="pyarrow")


def quality_filter(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Drop documents failing the :data:`QUALITY_BOUNDS` screen, keeping
    the input columns — the filtering form of :func:`repetition_quality`,
    fused into one batch-local pass (metrics never leave the task)."""
    f = _quality_batch_fn(text_col, id_col, emit_metrics=False)
    return ds.map_batches(f, batch_format="pyarrow")


def _quality_batch_fn(text_col: str, id_col: str, emit_metrics: bool):
    def f(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(_text_col(t, text_col), " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat = pc.list_flatten(toks)
        tok_np = np.asarray(flat.to_pylist(), dtype=object)
        tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = len(lens)
        offsets = np.r_[0, np.cumsum(lens)]
        parent = np.repeat(np.arange(n, dtype=np.int64), lens)

        n_words = lens.astype(np.float64)
        csum = np.r_[0, np.cumsum(tok_len)]
        sum_len = csum[offsets[1:]] - csum[offsets[:-1]]
        mean_word_len = np.divide(
            sum_len, n_words, out=np.zeros(n), where=lens > 0
        )

        th = stable64_array(list(tok_np), seed=0x70C5).view(np.uint64) \
            if len(tok_np) else np.zeros(0, np.uint64)

        # top-token share: runs of identical (doc, token-hash)
        top_frac = np.zeros(n)
        if len(th):
            order = np.lexsort((th, parent))
            p_s, h_s = parent[order], th[order]
            run_start = np.r_[True, (p_s[1:] != p_s[:-1]) | (h_s[1:] != h_s[:-1])]
            starts = np.flatnonzero(run_start)
            run_len = np.diff(np.r_[starts, len(h_s)])
            run_doc = p_s[starts]
            doc_first_run = np.r_[True, run_doc[1:] != run_doc[:-1]]
            max_run = np.maximum.reduceat(run_len, np.flatnonzero(doc_first_run))
            docs_present = run_doc[doc_first_run]
            top_frac[docs_present] = max_run / n_words[docs_present]

        # duplicate-2-gram occurrence fraction
        dup_frac = np.zeros(n)
        if len(th) > 1:
            same_doc = parent[1:] == parent[:-1]
            with np.errstate(over="ignore"):
                gh = mix64(th[:-1] * np.uint64(0x9E3779B97F4A7C15) + th[1:])
            g_doc, g_h = parent[:-1][same_doc], gh[same_doc]
            if len(g_h):
                order = np.lexsort((g_h, g_doc))
                d_s, h_s = g_doc[order], g_h[order]
                is_dup = np.r_[False,
                               (d_s[1:] == d_s[:-1]) & (h_s[1:] == h_s[:-1])]
                doc_first = np.r_[True, d_s[1:] != d_s[:-1]]
                dup_cnt = np.add.reduceat(
                    is_dup.astype(np.int64), np.flatnonzero(doc_first)
                )
                tot = np.add.reduceat(
                    np.ones(len(d_s), np.int64), np.flatnonzero(doc_first)
                )
                docs_present = d_s[doc_first]
                dup_frac[docs_present] = dup_cnt / tot

        b = QUALITY_BOUNDS
        keep = (
            (lens >= b["min_words"]) & (lens <= b["max_words"])
            & (dup_frac <= b["max_dup_2gram_frac"])
            & (top_frac <= b["max_top_token_frac"])
            & (mean_word_len >= b["min_mean_word_len"])
            & (mean_word_len <= b["max_mean_word_len"])
        )
        if not emit_metrics:
            return t.filter(pa.array(keep))
        return pa.table({
            id_col: t[id_col],
            "n_words": pa.array(lens),
            "mean_word_len": pc.round(pa.array(mean_word_len), ndigits=6),
            "dup_2gram_frac": pc.round(pa.array(dup_frac), ndigits=6),
            "top_token_frac": pc.round(pa.array(top_frac), ndigits=6),
            "keep": pa.array(keep.astype(np.int64)),
        })

    return f


# --------------------------------------------------------------------------
# Benchmark decontamination (n-gram overlap against a held-out set)
# --------------------------------------------------------------------------

NGRAM_WIDTH = 8


def _gram_hashes(texts: pa.Array, width: int) -> tuple[np.ndarray, np.ndarray]:
    """(doc_index_per_gram, gram_hash) for all ``width``-token grams.

    Rolling polynomial over per-token 64-bit hashes: ``width`` shifted
    vectorized multiply-adds, no per-gram Python.  Null texts count as
    empty (no grams).
    """
    toks = pc.split_pattern(pc.coalesce(texts, pa.scalar("", texts.type)), " ")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    flat = pc.list_flatten(toks)
    tok_list = flat.to_pylist()
    if not tok_list:
        return np.zeros(0, np.int64), np.zeros(0, np.uint64)
    th = stable64_array(tok_list, seed=0xDEC0).view(np.uint64)
    parent = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    m = len(th) - width + 1
    if m <= 0:
        return np.zeros(0, np.int64), np.zeros(0, np.uint64)
    gh = np.zeros(m, np.uint64)
    with np.errstate(over="ignore"):
        for j in range(width):
            gh = gh * np.uint64(0x100000001B3) + th[j:j + m]
        gh = mix64(gh)
    inside = parent[:m] == parent[width - 1:]
    return parent[:m][inside], gh[inside]


def benchmark_gram_set(bench_ds, text_col: str = "text",
                       width: int = NGRAM_WIDTH):
    """Distinct gram hashes of the benchmark set as a broadcast ObjectRef."""
    import ray

    parts = []
    for t in bench_ds.iter_batches(batch_format="pyarrow", batch_size=4096):
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        parts.append(_gram_hashes(texts, width)[1])
    grams = np.unique(np.concatenate(parts)) if parts \
        else np.zeros(0, np.uint64)
    return ray.put(grams)


def benchmark_gram_bloom(bench_ds, text_col: str = "text",
                         width: int = NGRAM_WIDTH, bits_log2: int = 20):
    """Bloom-filter form of :func:`benchmark_gram_set` — the scale path
    when the benchmark gram set itself is too large to broadcast raw (the
    filter is ``2^bits_log2/8`` bytes regardless of gram count).  False
    positives flag extra training docs (conservative); false negatives
    cannot occur."""
    import ray

    from dedup_ray.stages.sketch import bloom_build

    parts = []
    for t in bench_ds.iter_batches(batch_format="pyarrow", batch_size=4096):
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        parts.append(_gram_hashes(texts, width)[1])
    grams = np.concatenate(parts) if parts else np.zeros(0, np.uint64)
    return ray.put(("bloom", bloom_build(grams, bits_log2=bits_log2)))


def decontaminate(train_ds, bench_grams_ref, text_col: str = "text",
                  id_col: str = "doc_id", width: int = NGRAM_WIDTH):
    """Flag training documents sharing any ``width``-token gram with the
    benchmark set.  Output: ``(id_col, n_contam, contaminated)``.

    The benchmark gram set rides the object store once (``ray.put`` by the
    caller via :func:`benchmark_gram_set` — exact uint64 set — or
    :func:`benchmark_gram_bloom` — fixed-size filter); every map task
    reads the same copy zero-copy — never re-shipped per batch.
    """
    from dedup_ray.stages.sketch import bloom_contains

    def f(t: pa.Table) -> pa.Table:
        import ray

        grams = bench_grams_ref
        if not isinstance(grams, (np.ndarray, tuple)):  # raw ref passed
            grams = ray.get(grams)
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        doc_idx, gh = _gram_hashes(texts, width)
        if len(gh) == 0:
            hit = np.zeros(0, bool)
        elif isinstance(grams, tuple):  # ("bloom", words)
            hit = bloom_contains(grams[1], gh)
        else:
            hit = np.isin(gh, grams)
        n = t.num_rows
        contam = np.zeros(n, np.int64)
        if len(doc_idx):
            np.add.at(contam, doc_idx, hit.astype(np.int64))
        return pa.table({
            id_col: t[id_col],
            "n_contam": pa.array(contam),
            "contaminated": pa.array((contam > 0).astype(np.int64)),
        })

    return train_ds.map_batches(f, batch_format="pyarrow")


def compression_ratio(ds, text_col: str = "text", id_col: str = "doc_id",
                      max_ratio: float = 8.0, min_ratio: float = 1.5,
                      min_bytes: int = 120):
    """Per-document zlib compression ratio + keep flag; no shuffle.

    ``ratio = raw_bytes / compressed_bytes`` (level 6).  The standard
    cheap gibberish detector the token screens miss both ways: machine
    noise / base64 soup compresses poorly (measured ~1.2 for random
    printable ASCII, ~1.35 for random CJK — below ``min_ratio``) while
    template spam and degenerate repetition compress extremely well
    (ratio above ``max_ratio``) even when no single token or 2-gram
    dominates.  Varied prose sits ~2–4.  Empty docs keep ratio 0 and are
    kept (the length screens own that case); docs under ``min_bytes`` are
    likewise kept regardless of ratio — zlib's ~11-byte stream overhead
    makes the ratio meaningless for short text (a 41-byte sentence
    measures 0.91), and short-doc policy belongs to the length screens.

    Per-row zlib call — C code per document, the same per-doc granularity
    as the reference's per-record scorers (ST2); state-free, so a plain
    task pool suffices.  Not SQL-expressible (no zlib in the oracle
    engine): the screen is property-tested instead (random bytes fail
    low, repeated templates fail high, prose passes).
    """
    import zlib

    def f(t: pa.Table) -> pa.Table:
        txt = _text_col(t, text_col)
        ratios = np.zeros(t.num_rows, dtype=np.float64)
        short = np.zeros(t.num_rows, dtype=bool)
        for i, s in enumerate(txt.to_pylist()):
            if s:
                raw = s.encode("utf-8", "surrogatepass")
                ratios[i] = len(raw) / len(zlib.compress(raw, 6))
                short[i] = len(raw) < min_bytes
        ratios = np.round(ratios, 6)
        keep = ((ratios == 0.0) | short
                | ((ratios >= min_ratio) & (ratios <= max_ratio)))
        return pa.table(
            {
                id_col: t[id_col],
                "compression_ratio": pa.array(ratios),
                "keep": pa.array(keep),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Frequent n-gram detection (boilerplate phrase census)
# --------------------------------------------------------------------------


def frequent_ngrams(ds, n: int = 3, min_count: int = 5, top_k: int = 50,
                    text_col: str = "text"):
    """Corpus-wide frequent token n-grams: the boilerplate-phrase census
    web pipelines run before writing line/substring dedup rules ("click
    here to subscribe" style phrases surface at the top).

    Heavy-hitter shape: per-batch PARTIAL counts (all n-gram strings of a
    batch collapse through ``np.unique`` before leaving the task), one
    small grouped sum, ``count >= min_count`` filter, bounded
    ``sort.limit``.  The shuffle carries (gram, partial_count) rows —
    the same narrow-payload discipline as ``top_tokens``; for corpora
    where even distinct-gram cardinality hurts, the Count-Min sketch
    (``stages/sketch.py``) is the pre-filter scale path.

    Output: ``(gram, n)`` ordered by ``(n DESC, gram)``, top ``top_k``.
    """

    def partial(t: pa.Table) -> pa.Table:
        vals = _gram_strings(t, n, text_col)
        if len(vals) == 0:
            return pa.table({"gram": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        u, c = np.unique(vals, return_counts=True)
        return pa.table({"gram": pa.array(u, pa.string()),
                         "cnt": pa.array(c.astype(np.int64))})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("gram").sum("cnt")

    def finish(t: pa.Table) -> pa.Table:
        cnt = pc.cast(t["sum(cnt)"], pa.int64())
        keep = pc.greater_equal(cnt, min_count)
        return pa.table({"gram": t["gram"],
                         "n": cnt}).filter(keep)

    return agg.map_batches(finish, batch_format="pyarrow") \
        .sort(["n", "gram"], descending=[True, False]).limit(top_k)


# --------------------------------------------------------------------------
# Fuzzy decontamination (n-gram overlap fraction vs the benchmark set)
# --------------------------------------------------------------------------


def benchmark_gram_index(bench_ds, text_col: str = "text",
                         id_col: str = "doc_id", width: int = 3):
    """Posting index of the benchmark set's DISTINCT grams, broadcast
    once: ``(sorted gram hashes H, CSR offsets, bench ids per posting,
    bench ids, per-bench distinct-gram counts)``.  Benchmark sets are
    small by construction — when one is not, the cross-table similarity
    join (``ops/simjoin.py``) is the shuffle path for the same
    semantics."""
    import ray

    did, gh = [], []
    for t in bench_ds.iter_batches(batch_format="pyarrow", batch_size=4096):
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        d, g = _gram_hashes(texts, width)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        did.append(ids[d])
        gh.append(g)
    if not gh or not sum(len(g) for g in gh):
        empty = np.zeros(0, np.int64)
        return ray.put((np.zeros(0, np.uint64), np.zeros(1, np.int64),
                        empty, empty, empty))
    did, gh = np.concatenate(did), np.concatenate(gh)
    # distinct (bench, gram)
    order = np.lexsort((did, gh))
    did, gh = did[order], gh[order]
    first = np.r_[True, (gh[1:] != gh[:-1]) | (did[1:] != did[:-1])]
    did, gh = did[first], gh[first]
    hashes, inv = np.unique(gh, return_inverse=True)
    counts = np.bincount(inv, minlength=len(hashes))
    offsets = np.zeros(len(hashes) + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    postings = did[np.argsort(inv, kind="stable")]
    bids, sizes = np.unique(did, return_counts=True)
    return ray.put((hashes, offsets, postings, bids, sizes))


def fuzzy_decontaminate(train_ds, index_ref, text_col: str = "text",
                        id_col: str = "doc_id", width: int = 3,
                        min_containment: float = 0.15):
    """GPT-3/PaLM-style fuzzy decontamination: for every (train doc,
    benchmark doc) pair sharing enough DISTINCT ``width``-token grams,
    emit overlap statistics — ``containment`` = |∩| / |train grams| (the
    "fraction of the doc's n-grams seen in the benchmark" rule) and
    Jaccard — keeping pairs with containment >= ``min_containment``.

    One pass over training data, no shuffle: the posting index rides the
    object store; per batch the doc's distinct gram hashes binary-search
    the index and scatter-add into a dense (batch docs x bench docs)
    counter (benchmark side is small; see :func:`benchmark_gram_index`).

    Output: ``(id_col, bench_id, inter, containment, jaccard)``,
    rounded to 6dp for engine-exact comparison.
    """
    import ray

    def f(t: pa.Table) -> pa.Table:
        hashes, offsets, postings, bids, sizes = ray.get(index_ref) \
            if not isinstance(index_ref, tuple) else index_ref
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        doc_idx, gh = _gram_hashes(texts, width)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        id_type = t[id_col].type

        def empty():
            return pa.table({
                id_col: pa.array([], id_type),
                "bench_id": pa.array([], pa.int64()),
                "inter": pa.array([], pa.int64()),
                "containment": pa.array([], pa.float64()),
                "jaccard": pa.array([], pa.float64()),
            })

        if len(gh) == 0 or len(hashes) == 0:
            return empty()
        # per-doc distinct grams
        order = np.lexsort((gh, doc_idx))
        doc_idx, gh = doc_idx[order], gh[order]
        first = np.r_[True, (doc_idx[1:] != doc_idx[:-1])
                      | (gh[1:] != gh[:-1])]
        doc_idx, gh = doc_idx[first], gh[first]
        dt = np.bincount(doc_idx, minlength=t.num_rows)

        pos = np.searchsorted(hashes, gh)
        pos[pos == len(hashes)] = 0
        hit = hashes[pos] == gh
        hdoc, hpos = doc_idx[hit], pos[hit]
        plen = (offsets[hpos + 1] - offsets[hpos])
        if plen.sum() == 0:
            return empty()
        # expand posting ranges
        doc_rep = np.repeat(hdoc, plen)
        gather = np.repeat(offsets[hpos], plen) + (
            np.arange(int(plen.sum())) -
            np.repeat(np.cumsum(plen) - plen, plen))
        bench_rep = postings[gather]
        bcol = np.searchsorted(bids, bench_rep)
        mat = np.zeros((t.num_rows, len(bids)), np.int64)
        np.add.at(mat, (doc_rep, bcol), 1)
        di, bi = np.nonzero(mat)
        inter = mat[di, bi]
        cont = inter / dt[di]
        jacc = inter / (dt[di] + sizes[bi] - inter)
        keep = cont >= min_containment
        di, bi, inter = di[keep], bi[keep], inter[keep]
        return pa.table({
            id_col: pa.array(ids[di], id_type),
            "bench_id": pa.array(bids[bi].astype(np.int64)),
            "inter": pa.array(inter),
            "containment": pa.array(np.round(cont[keep], 6)),
            "jaccard": pa.array(np.round(jacc[keep], 6)),
        })

    return train_ds.map_batches(f, batch_format="pyarrow")


def _gram_strings(t: pa.Table, n: int, text_col: str) -> np.ndarray:
    """All token n-gram strings of a batch (within-doc windows only)."""
    toks = pc.split_pattern(_text_col(t, text_col), " ")
    flat = np.asarray(pc.list_flatten(toks).to_pylist(), object)
    live = flat != ""
    parent = pc.list_parent_indices(toks).to_numpy(
        zero_copy_only=False)[live]
    flat = flat[live]
    if len(flat) < n:
        return np.zeros(0, object)
    import pandas as pd

    gram = pd.Series(flat[: len(flat) - n + 1], dtype=object)
    ok = parent[: len(flat) - n + 1] == parent[n - 1:]
    for j in range(1, n):
        gram = gram + " " + pd.Series(flat[j: len(flat) - n + 1 + j],
                                      dtype=object)
    return gram.to_numpy()[ok]


CMS_DEPTH, CMS_WIDTH_LOG2 = 4, 16


def frequent_ngrams_cms(ds, n: int = 3, min_count: int = 5, top_k: int = 50,
                        text_col: str = "text", seed: int = 0x515):
    """:func:`frequent_ngrams` with a Count-Min pre-filter — the scale
    path when the DISTINCT-gram exchange itself is the bottleneck.

    Pass 1 builds a FIXED-SIZE sketch (depth x 2^16 registers; the
    grouped sum carries at most depth·width partial rows per batch, never
    gram strings).  Pass 2 re-derives each batch's grams and forwards
    only those whose CMS estimate reaches ``min_count`` into the exact
    grouped count.  CMS never undercounts, so the candidate set is a
    SUPERSET of the true heavy hitters and the exact recount makes the
    final output EQUAL to the one-pass exact operator — pinned by an
    equality test.  What shrinks is the gram-keyed shuffle: only
    plausibly-frequent grams ever leave a task.
    """
    from dedup_ray.util.exchange import exchange_group_apply

    W = 1 << CMS_WIDTH_LOG2
    salts = [np.uint64(seed * 1000003 + d) for d in range(CMS_DEPTH)]

    def slots_of(grams: np.ndarray) -> np.ndarray:
        h = stable64_array(list(grams), seed=seed).view(np.uint64)
        return np.stack([
            (mix64(h ^ s) & np.uint64(W - 1)).astype(np.int64) + d * W
            for d, s in enumerate(salts)
        ])  # (depth, n_grams)

    def reg_partial(t: pa.Table) -> pa.Table:
        grams = _gram_strings(t, n, text_col)
        if len(grams) == 0:
            return pa.table({"slot": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        slots = slots_of(grams).ravel()
        u, c = np.unique(slots, return_counts=True)
        return pa.table({"slot": pa.array(u),
                         "cnt": pa.array(c.astype(np.int64))})

    def reg_sum(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({"slot": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        sl = part["slot"].to_numpy(zero_copy_only=False)
        c = part["cnt"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(sl, return_inverse=True)
        tot = np.zeros(len(u), np.int64)
        np.add.at(tot, inv, c)
        return pa.table({"slot": pa.array(u), "cnt": pa.array(tot)})

    reg_rows = exchange_group_apply(
        ds.map_batches(reg_partial, batch_format="pyarrow"),
        "slot", reg_sum, 8)
    import ray

    regs = np.zeros(CMS_DEPTH * W, np.int64)
    for b in reg_rows.iter_batches(batch_format="pyarrow",
                                   batch_size=None):
        regs[b["slot"].to_numpy(zero_copy_only=False)] = \
            b["cnt"].to_numpy(zero_copy_only=False)
    regs_ref = ray.put(regs)

    def candidate_partial(t: pa.Table) -> pa.Table:
        r = ray.get(regs_ref)
        grams = _gram_strings(t, n, text_col)
        if len(grams) == 0:
            return pa.table({"gram": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        u, c = np.unique(grams, return_counts=True)
        est = r[slots_of(u)].min(axis=0)
        keep = est >= min_count
        return pa.table({"gram": pa.array(u[keep], pa.string()),
                         "cnt": pa.array(c[keep].astype(np.int64))})

    agg = ds.map_batches(candidate_partial, batch_format="pyarrow") \
        .groupby("gram").sum("cnt")

    def finish(t: pa.Table) -> pa.Table:
        cnt = pc.cast(t["sum(cnt)"], pa.int64())
        return pa.table({"gram": t["gram"], "n": cnt}).filter(
            pc.greater_equal(cnt, min_count))

    return agg.map_batches(finish, batch_format="pyarrow") \
        .sort(["n", "gram"], descending=[True, False]).limit(top_k)


# --------------------------------------------------------------------------
# Word-blocklist screen (C4 §2.2 / UT1-list shape: flag documents whose
# blocklisted-token fraction exceeds a threshold)
# --------------------------------------------------------------------------

def badword_fraction(ds, words, text_col: str = "text",
                     id_col: str = "doc_id", threshold: float = 0.05):
    """Blocklist token-fraction screen: per document, the fraction of
    whitespace tokens (lowercased) that appear in ``words``, plus a
    ``blocked`` flag at ``frac > threshold``.

    The C4 cleaning recipe drops any page containing a word from a
    blocklist; the fraction form generalizes it (threshold 0 reproduces
    the drop-on-any-hit rule).  Shuffle-free: the list broadcasts in the
    task closure (word lists are KBs), membership is one vectorized
    ``pc.is_in`` over the flattened token array per batch, and the
    per-doc counts come from ``np.bincount`` over the token parent
    index — no Python row loop, no exchange.  At 100 TB this is a pure
    map stage that pipelines with the quality screens.
    """
    value_set = pa.array(sorted({w.lower() for w in words}), pa.string())

    def f(t: pa.Table) -> pa.Table:
        from dedup_ray.stages.textstats import explode_tokens

        flat, parents, n_tok = explode_tokens(_text_col(t, text_col),
                                              t.num_rows)
        hit = pc.is_in(pc.utf8_lower(flat), value_set=value_set)
        hits = hit.to_numpy(zero_copy_only=False).astype(np.int64)
        n_flag = np.bincount(parents, weights=hits,
                             minlength=t.num_rows).astype(np.int64)
        frac = n_flag / np.maximum(n_tok, 1)
        return pa.table({
            id_col: t[id_col],
            "n_tokens": pa.array(n_tok),
            "n_flagged": pa.array(n_flag),
            "bad_frac": pa.array(np.round(frac, 6)),
            "blocked": pa.array(frac > threshold),
        })

    return ds.map_batches(f, batch_format="pyarrow")


# ftfy-style encoding-repair screen: the classic UTF-8-read-as-cp1252
# mojibake sequences (each damaged code point becomes a fixed marker
# string).  The SAME ordered pair list drives the Arrow kernel and the
# DuckDB oracle (count/replace parity), so the list IS the spec.  Built
# from escapes to keep the source file ASCII-safe.
MOJIBAKE_PAIRS = [
    ("Ã©", "é"),            # 'Ã©'   -> é
    ("Ã¼", "ü"),            # 'Ã¼'   -> ü
    ("â€™", "’"),      # 'â€™'  -> right single quote
    ("â€œ", "“"),      # 'â€œ'  -> left double quote
]


def mojibake_screen(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Encoding-damage screen + repair (the ftfy pass of CC pipelines).

    Double-decoded UTF-8 ('café' stored as 'cafÃ©')
    survives crawling in a mechanical, recognizable form.  Per document
    this stage counts marker hits across ``MOJIBAKE_PAIRS``, repairs
    them with global replaces (applied in list order), and emits
    (id, n_mojibake, flagged, n_chars_repaired).  Pure batch-local
    vectorized Arrow (count_substring + replace_substring) — no
    shuffle, no state; at 100 TB this rides any existing map wave.
    """
    def screen(t: pa.Table) -> pa.Table:
        txt = _text_col(t, text_col)
        total = np.zeros(t.num_rows, dtype=np.int64)
        repaired = txt
        for bad, good in MOJIBAKE_PAIRS:
            total += pc.count_substring(repaired, bad).to_numpy(
                zero_copy_only=False).astype(np.int64)
            repaired = pc.replace_substring(repaired, bad, good)
        return pa.table({
            id_col: t[id_col],
            "n_mojibake": pa.array(total),
            "flagged": pa.array(total > 0),
            "n_chars_repaired": pc.cast(
                pc.utf8_length(repaired), pa.int64()),
        })

    return ds.map_batches(screen, batch_format="pyarrow")


def mojibake_oracle_exprs(col: str) -> tuple[str, str]:
    """(n_mojibake, repaired-text) SQL expressions replaying the pair
    list — counts via length deltas over successive repairs, repair via
    nested replace() in the same order as the kernel."""
    count_terms, repaired = [], col
    for bad, good in MOJIBAKE_PAIRS:
        count_terms.append(
            f"(length({repaired}) - length(replace({repaired}, '{bad}', '')))"
            f" // {len(bad)}"
        )
        repaired = f"replace({repaired}, '{bad}', '{good}')"
    return " + ".join(count_terms), repaired


def stitch_candidates(ds, id_col: str = "doc_id", text_col: str = "text",
                      k: int = 8, num_partitions: int = 16):
    """Pagination-stitch candidates: ordered pairs (a, b) where document
    a's LAST ``k`` tokens equal document b's FIRST ``k`` tokens — the
    page-2-continues-page-1 signal used to reassemble articles split
    across crawl URLs (and to catch scraped continuations the symmetric
    near-dup tiers miss, since two halves of one article share little
    global content).

    One narrow exchange keyed on the boundary gram STRING (the vectorized
    string-key hash routes it; in-partition the join key is the gram text
    itself, so 64-bit collisions cannot fabricate pairs).  Docs with
    < ``k`` tokens emit no grams — a shorter boundary match is ambiguous
    boilerplate, not pagination.  Output: ``(id_a, id_b, gram)``,
    ``id_a ≠ id_b``.
    """
    from dedup_ray.util.exchange import exchange_group_apply

    def grams(t: pa.Table) -> pa.Table:
        txt = _text_col(t, text_col)
        toks = pc.split_pattern(txt, " ")
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        ok = np.flatnonzero(n >= k)
        ids = t[id_col].to_numpy(zero_copy_only=False)[ok]
        sel = pa.array(ok)
        head = pc.binary_join(
            pc.list_slice(toks.take(sel), 0, k), " "
        )
        # tail grams: list_slice has no negative start — gather the last
        # k tokens of each kept doc from the flat token array instead
        if len(ok):
            flat = pc.list_flatten(toks)
            if isinstance(flat, pa.ChunkedArray):
                flat = flat.combine_chunks()
            ends = np.cumsum(n)[ok]
            idx = (ends[:, None] - k + np.arange(k)[None, :]).ravel()
            tail_toks = flat.take(pa.array(idx))
            offs = pa.array(
                np.arange(0, k * (len(ok) + 1), k, dtype=np.int32))
            tail = pc.binary_join(
                pa.ListArray.from_arrays(offs, tail_toks), " ")
        else:
            tail = head
        out_ids = np.concatenate([ids, ids]) if len(ok) else ids
        kinds = np.r_[np.zeros(len(ok), np.int8),
                      np.ones(len(ok), np.int8)]  # 0 = head, 1 = tail
        gram = pa.concat_arrays([
            head.combine_chunks() if isinstance(head, pa.ChunkedArray)
            else head,
            tail.combine_chunks() if isinstance(tail, pa.ChunkedArray)
            else tail,
        ]) if len(ok) else pa.array([], pa.string())
        return pa.table({
            id_col: pa.array(out_ids, pa.int64()),
            "gram": gram,
            "kind": pa.array(kinds, pa.int8()),
        })

    rows = ds.map_batches(grams, batch_format="pyarrow")

    def pairs(part: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64()),
                          "gram": pa.array([], pa.string())})
        if part.num_rows == 0 or "gram" not in part.column_names:
            return empty
        tails = part.filter(pc.equal(part["kind"], pa.scalar(1, pa.int8())))
        heads = part.filter(pc.equal(part["kind"], pa.scalar(0, pa.int8())))
        if not tails.num_rows or not heads.num_rows:
            return empty
        lt = pa.table({"id_a": tails[id_col], "gram": tails["gram"]})
        rh = pa.table({"id_b": heads[id_col], "gram": heads["gram"]})
        j = lt.join(rh, keys="gram", join_type="inner")
        j = j.filter(pc.not_equal(j["id_a"], j["id_b"]))
        return j.select(["id_a", "id_b", "gram"]).combine_chunks()

    return exchange_group_apply(rows, "gram", pairs, num_partitions)


def luhn_valid_array(numbers: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized Luhn mod-10 checksum over FIXED-WIDTH digit strings
    (the validation pass behind credit-card PII detection — a bare
    ``\\d{16}`` regex false-positives on order ids and timestamps; the
    checksum kills ~90% of them).  Returns int64 0/1.

    The digit matrix comes from a zero-copy uint32 view of the UTF-32
    numpy string buffer (no per-row Python); doubling applies to every
    second digit from the rightmost-1 leftward, per the spec."""
    if isinstance(numbers, pa.ChunkedArray):
        numbers = numbers.combine_chunks()
    vals = numbers.to_numpy(zero_copy_only=False)
    if len(vals) == 0:
        return pa.array([], pa.int64())
    width = len(vals[0])
    u = np.asarray(vals, dtype=f"U{width}")
    digits = u.view(np.uint32).reshape(len(u), width).astype(np.int64) \
        - ord("0")
    # position from right (1-based): width - col; double where even
    dbl = (np.arange(width)[None, :] + width) % 2 == 0
    d2 = np.where(dbl, digits * 2, digits)
    d2 = np.where(d2 > 9, d2 - 9, d2)
    return pa.array((d2.sum(axis=1) % 10 == 0).astype(np.int64),
                    pa.int64())
