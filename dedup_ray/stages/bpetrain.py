"""Distributed BPE merge training (Sennrich et al. 2016, arXiv:1508.07909).

Learning a byte-pair-encoding vocabulary is the canonical "iterate over the
corpus" step of an LLM data pipeline.  The distributed shape rests on the
classic factorization: BPE statistics depend on the corpus only through the
WORD HISTOGRAM, so

1. one narrow exchange builds ``(word, count)`` — the only corpus-sized
   pass;
2. every merge round then runs over the histogram (vocab-bounded:
   ~10^6-10^8 types at web scale, not 10^12 documents): a ``map_batches``
   emits per-batch partial adjacent-pair counts weighted by word count,
   one small grouped sum + ``sort.limit(1)`` picks the argmax pair
   (ties broken ``(count DESC, a, b)`` — binary collation, engine-
   independent for the codepoint symbols used here), and a second
   ``map_batches`` applies the merge vectorized over the flattened
   symbol array.  Driver state per round: ONE (a, b, count) row.

Merge semantics follow the reference implementation exactly: pair counts
include overlapping occurrences ("aaa" counts (a,a) twice); application is
greedy leftmost non-overlapping, which for a run of k consecutive match
positions keeps positions ``run_start, run_start+2, ...`` (the parity
rule — only reachable when a == b).  Words are whitespace tokens; initial
symbols are the word's codepoints plus a final ``</w>`` marker symbol.

The SQL oracle (:func:`bpe_sql`) is GENERATED for a fixed round count from
the same constants: each round unrolls to CTEs (pair explode -> grouped
count -> argmax -> window-function parity rule -> list rebuild), so the
greedy semantics above are checked round by round, not just asserted.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

END_MARK = "</w>"


def word_histogram(ds, text_col: str = "text"):
    """``(word, n)`` corpus word counts — per-batch ``np.unique`` partials,
    one small grouped sum (the only corpus-sized pass of BPE training)."""

    def partial(t: pa.Table) -> pa.Table:
        texts = pc.coalesce(t[text_col], pa.scalar("", t[text_col].type))
        toks = pc.list_flatten(pc.split_pattern(texts, " "))
        toks = toks.filter(pc.not_equal(toks, ""))
        v, c = np.unique(np.asarray(toks.to_pylist(), object),
                         return_counts=True)
        return pa.table({"word": pa.array(v, pa.string()),
                         "n": pa.array(c.astype(np.int64))})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("word").sum("n")


def _init_state(hist):
    """Histogram -> ``(n, syms: list<string>)`` symbol state."""

    def init(t: pa.Table) -> pa.Table:
        words = t["word"].to_pylist()
        n = t["sum(n)"] if "sum(n)" in t.column_names else t["n"]
        flat, offsets = [], [0]
        for w in words:
            flat.extend(w)
            flat.append(END_MARK)
            offsets.append(len(flat))
        syms = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(flat, pa.string()))
        return pa.table({"n": pc.cast(n, pa.int64()), "syms": syms})

    return hist.map_batches(init, batch_format="pyarrow")


def _flat(t: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    syms = t["syms"]
    if isinstance(syms, pa.ChunkedArray):
        syms = syms.combine_chunks()
    flat = np.asarray(syms.flatten().to_pylist(), object)
    offsets = syms.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    n = t["n"].to_numpy(zero_copy_only=False)
    return flat, offsets - offsets[0], n


def _pair_partials(t: pa.Table) -> pa.Table:
    """Per-batch adjacent-pair partial counts, weighted by word count."""
    flat, offsets, n = _flat(t)
    lens = np.diff(offsets)
    if len(flat) < 2:
        return pa.table({"a": pa.array([], pa.string()),
                         "b": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    head = np.ones(len(flat) - 1, bool)
    head[offsets[1:-1] - 1] = False  # pairs never cross a word boundary
    a, b = flat[:-1][head], flat[1:][head]
    w = np.repeat(n, np.maximum(lens - 1, 0))
    key = pd.Series(a, dtype=object) + "\x1f" + pd.Series(b, dtype=object)
    u, idx, inv = np.unique(key.to_numpy(), return_index=True,
                            return_inverse=True)
    cnt = np.zeros(len(u), np.int64)
    np.add.at(cnt, inv, w)
    return pa.table({"a": pa.array(a[idx], pa.string()),
                     "b": pa.array(b[idx], pa.string()),
                     "cnt": pa.array(cnt)})


def _apply_merge(t: pa.Table, a: str, b: str) -> pa.Table:
    """Greedy leftmost non-overlapping merge of (a, b), vectorized."""
    flat, offsets, n = _flat(t)
    if len(flat) < 2:
        return t
    head = np.ones(len(flat) - 1, bool)
    head[offsets[1:-1] - 1] = False
    match = np.flatnonzero((flat[:-1] == a) & (flat[1:] == b) & head)
    if len(match):
        starts = np.r_[True, np.diff(match) > 1]
        run_first = match[starts][np.cumsum(starts) - 1]
        kept = match[((match - run_first) % 2) == 0]
    else:
        kept = match
    keep_mask = np.ones(len(flat), bool)
    keep_mask[kept + 1] = False
    new_flat = flat.copy()
    new_flat[kept] = a + b
    new_flat = new_flat[keep_mask]
    word_of_kept = np.searchsorted(offsets, kept, side="right") - 1
    new_lens = np.diff(offsets) - np.bincount(
        word_of_kept, minlength=len(offsets) - 1)
    new_off = np.zeros(len(offsets), np.int64)
    np.cumsum(new_lens, out=new_off[1:])
    syms = pa.ListArray.from_arrays(
        pa.array(new_off, pa.int32()),
        pa.array(new_flat, pa.string()))
    return pa.table({"n": pa.array(n, pa.int64()), "syms": syms})


def _local_top_pair(t: pa.Table):
    """Argmax pair of one in-memory state table, same tie-break as the
    distributed sort: (count DESC, a, b)."""
    p = _pair_partials(t)
    if p.num_rows == 0:
        return None
    a = p["a"].to_numpy(zero_copy_only=False).astype(str)
    b = p["b"].to_numpy(zero_copy_only=False).astype(str)
    c = p["cnt"].to_numpy(zero_copy_only=False)
    order = np.lexsort((b, a, -c))
    j = order[0]
    return str(a[j]), str(b[j]), int(c[j])


def bpe_train(ds, num_merges: int, text_col: str = "text",
              local_vocab_limit: int = 200_000) -> pa.Table:
    """Learn ``num_merges`` BPE merge rules from the corpus.

    Returns ``(merge_round, left_sym, right_sym, pair_count)`` — the rule
    table a tokenizer would apply.  Stops early if the corpus runs out of
    pairs (matching the generated oracle, whose later rounds then select
    nothing).

    Size gate (the ``cc_local_edge_limit`` pattern): the merge loop runs
    over the word histogram, so when the histogram has at most
    ``local_vocab_limit`` types it collects ONCE and every round runs the
    SAME vectorized kernels driver-side — 2 Ray jobs total instead of
    2 per round, identical output (equivalence pytest).  Above the bound
    the loop stays fully distributed: per-round partial pair counts,
    one grouped sum + sort/limit argmax, vectorized merge apply.
    """
    hist = word_histogram(ds, text_col)
    n_vocab = hist.count()
    rounds, lefts, rights, counts = [], [], [], []

    if n_vocab <= local_vocab_limit:
        parts = list(_init_state(hist).iter_batches(
            batch_format="pyarrow", batch_size=None))
        state_t = pa.concat_tables(parts) if parts else pa.table({
            "n": pa.array([], pa.int64()),
            "syms": pa.array([], pa.list_(pa.string())),
        })
        for r in range(1, num_merges + 1):
            top = _local_top_pair(state_t)
            if top is None:
                break
            a, b, cnt = top
            rounds.append(r)
            lefts.append(a)
            rights.append(b)
            counts.append(cnt)
            state_t = _apply_merge(state_t, a, b)
    else:
        state = _init_state(hist).materialize()
        for r in range(1, num_merges + 1):
            top = (
                state.map_batches(_pair_partials, batch_format="pyarrow")
                .groupby(["a", "b"]).sum("cnt")
                .sort(["sum(cnt)", "a", "b"],
                      descending=[True, False, False])
                .limit(1).take_all()
            )
            if not top:
                break
            a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["sum(cnt)"])
            rounds.append(r)
            lefts.append(a)
            rights.append(b)
            counts.append(cnt)
            state = state.map_batches(
                lambda t, a=a, b=b: _apply_merge(t, a, b),
                batch_format="pyarrow",
            ).materialize()
    return pa.table({
        "merge_round": pa.array(rounds, pa.int64()),
        "left_sym": pa.array(lefts, pa.string()),
        "right_sym": pa.array(rights, pa.string()),
        "pair_count": pa.array(counts, pa.int64()),
    })


def bpe_sql(num_merges: int, table: str = "documents",
            text_col: str = "text") -> str:
    """DuckDB oracle for :func:`bpe_train`, generated round by round from
    the same constants (word split, ``</w>`` marker, parity rule,
    tie-break order)."""
    ctes = [f"""
        w AS MATERIALIZED (SELECT t AS word, count(*)::BIGINT AS n FROM (
                  SELECT unnest(list_filter(string_split({text_col}, ' '),
                                x -> x <> '')) AS t FROM {table})
              GROUP BY t),
        s0 AS MATERIALIZED (SELECT word, n,
                      list_append(list_transform(
                          generate_series(1, length(word)),
                          i -> substr(word, i, 1)), '{END_MARK}') AS syms
               FROM w)"""]
    for r in range(1, num_merges + 1):
        p = f"s{r - 1}"
        ctes.append(f"""
        e{r} AS MATERIALIZED (SELECT word, n, syms,
                        unnest(generate_series(1, length(syms) - 1)) AS i
                 FROM {p}),
        p{r} AS MATERIALIZED (SELECT syms[i] AS a, syms[i + 1] AS b,
                        sum(n)::BIGINT AS cnt
                 FROM e{r} GROUP BY 1, 2),
        b{r} AS MATERIALIZED (SELECT a, b, cnt FROM p{r}
                 ORDER BY cnt DESC, a, b LIMIT 1),
        m{r} AS MATERIALIZED (SELECT e.word, e.i FROM e{r} e, b{r} bb
                 WHERE e.syms[e.i] = bb.a AND e.syms[e.i + 1] = bb.b),
        r{r} AS MATERIALIZED (SELECT word, i,
                        sum(newrun) OVER (PARTITION BY word
                                          ORDER BY i) AS run
                 FROM (SELECT word, i,
                              CASE WHEN i - lag(i) OVER (
                                       PARTITION BY word ORDER BY i) = 1
                                   THEN 0 ELSE 1 END AS newrun
                       FROM m{r})),
        k{r} AS MATERIALIZED (SELECT word, i FROM (
                     SELECT word, i,
                            min(i) OVER (PARTITION BY word, run) AS rf
                     FROM r{r})
                 WHERE (i - rf) % 2 = 0),
        s{r} AS MATERIALIZED (SELECT q.word, any_value(q.n) AS n,
                        list(CASE WHEN kk.i IS NOT NULL
                                  THEN q.syms[q.i] || q.syms[q.i + 1]
                                  ELSE q.syms[q.i] END ORDER BY q.i) AS syms
                 FROM (SELECT word, n, syms,
                              unnest(generate_series(1, length(syms))) AS i
                       FROM {p}) q
                 LEFT JOIN k{r} kk ON q.word = kk.word AND q.i = kk.i
                 LEFT JOIN k{r} cc ON q.word = cc.word AND q.i = cc.i + 1
                 WHERE cc.i IS NULL
                 GROUP BY q.word)""")
    finals = " UNION ALL ".join(
        f"SELECT {r} AS merge_round, a AS left_sym, b AS right_sym, "
        f"cnt AS pair_count FROM b{r}"
        for r in range(1, num_merges + 1)
    )
    return "WITH " + ",".join(ctes) + " " + finals


def bpe_encode_counts(ds, merges: pa.Table, text_col: str = "text",
                      id_col: str = "doc_id"):
    """Apply a learned merge table and count BPE tokens per document.

    The rule list broadcasts via task closure (it is ``num_merges`` rows);
    each batch tokenizes, dedups to its DISTINCT words, replays the merges
    on that word set with the same vectorized kernel the trainer uses, and
    scatters the per-word token counts back to documents — per-batch work
    is O(distinct words · merges), not O(corpus · merges).  Output:
    ``(id_col, n_bpe)``.
    """
    rules = list(zip(merges["left_sym"].to_pylist(),
                     merges["right_sym"].to_pylist()))

    def enc(t: pa.Table) -> pa.Table:
        texts = pc.coalesce(t[text_col], pa.scalar("", t[text_col].type))
        toks = pc.split_pattern(texts, " ")
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        flat_tok = np.asarray(
            pc.list_flatten(toks).to_pylist(), object)
        live = flat_tok != ""
        flat_tok, parent = flat_tok[live], parent[live]
        n_bpe = np.zeros(t.num_rows, np.int64)
        if len(flat_tok):
            uniq, inv = np.unique(flat_tok, return_inverse=True)
            sym_flat, offs = [], [0]
            for w in uniq:
                sym_flat.extend(w)
                sym_flat.append(END_MARK)
                offs.append(len(sym_flat))
            state = pa.table({
                "n": pa.array(np.ones(len(uniq), np.int64)),
                "syms": pa.ListArray.from_arrays(
                    pa.array(offs, pa.int32()),
                    pa.array(sym_flat, pa.string())),
            })
            for a, b in rules:
                state = _apply_merge(state, a, b)
            _, offsets, _ = _flat(state)
            klen = np.diff(offsets)
            np.add.at(n_bpe, parent, klen[inv])
        return pa.table({id_col: t[id_col], "n_bpe": pa.array(n_bpe)})

    return ds.map_batches(enc, batch_format="pyarrow")


def bpe_encode_sql(num_merges: int, table: str = "documents",
                   text_col: str = "text", id_col: str = "doc_id") -> str:
    """Oracle for :func:`bpe_encode_counts` over the merges learned from
    the same corpus: reuse the trainer's unrolled CTEs, then join each
    document's words against the final symbol state."""
    train = bpe_sql(num_merges, table, text_col)
    # keep the CTE chain, drop the trainer's final UNION ALL select
    head = train.split(" SELECT 1 AS merge_round")[0]
    return head + f"""
        , wordtok AS (SELECT word, length(syms)::BIGINT AS k
                      FROM s{num_merges}),
        docw AS (SELECT {id_col},
                        unnest(list_filter(string_split({text_col}, ' '),
                               x -> x <> '')) AS word
                 FROM {table})
        SELECT d.{id_col}, coalesce(sum(w.k), 0)::BIGINT AS n_bpe
        FROM {table} d
        LEFT JOIN docw dw ON d.{id_col} = dw.{id_col}
        LEFT JOIN wordtok w ON dw.word = w.word
        GROUP BY d.{id_col}
    """
