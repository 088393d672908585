"""Exact substring-duplication coverage and removal (ExactSubstr mode).

The suffix-array substring dedup of Lee et al. 2022 ("Deduplicating
Training Data Makes Language Models Better", arXiv:2107.06499) finds every
position covered by a substring of length >= L that occurs more than once
in the corpus.  The engine's scale path approximates this with CDC chunks
(``stages/substring.py``); this module is the EXACT mode, built on an
equivalence that removes the need for a (non-partitionable) global suffix
array:

    A position is covered by a duplicated substring of length >= L
    <=>  it is covered by a duplicated L-char window.

(=>: every L-window of a duplicated substring of length >= L is itself
duplicated.  <=: a duplicated L-window IS a duplicated substring of
length L.)  Duplicated L-windows are detectable with one grouped count
over rolling window hashes — a narrow (hash, partial_count) exchange, the
same shape as C4 line dedup — instead of suffix-array construction.

Plan (two passes over text, one narrow shuffle):

1. Per batch: rolling 64-bit polynomial hashes of all L-char windows
   (prefix-sum trick over the flattened codepoint array — no per-window
   work), pre-aggregated to ``(ghash, partial_count)`` via ``np.unique``.
2. One exchange keyed on ``ghash`` -> global counts -> keep count >= 2.
   The surviving set (distinct *duplicated* grams only — boilerplate-
   bounded, not corpus-bounded) broadcasts via ``ray.put``; above the
   broadcast budget the same table joins back through a second
   co-partitioned exchange instead
   (:func:`exact_substring_coverage_joined`, output-equal by test).
3. Per batch: recompute window hashes, mark duplicated starts
   (``np.searchsorted`` against the sorted broadcast set), and reduce to
   per-doc covered-char counts (interval-union via the gaps-and-islands
   identity, vectorized) or to cut text (difference-array cover mask).

Semantics notes:

- Char (codepoint) windows, not bytes: matches SQL ``substr`` semantics so
  the DuckDB oracle can replay the definition.  ASCII batches take a
  zero-copy fast path over the Arrow UTF-8 buffer; mixed batches decode
  per doc to UTF-32 (correct for any input, slower).
- ``exact_substring_cut`` removes covered chars from EVERY occurrence
  (deterministic and partition/order-invariant).  Lee et al. keep one
  occurrence; "keep first" needs a global document order and is provided
  at chunk granularity by the CDC path — the all-occurrence policy here is
  the one whose output is a pure function of corpus content.
- 64-bit window hashes can collide (~n_windows^2 / 2^64): a collision can
  only ADD coverage, never hide a real duplicate.  Reference analog: the
  exact pairwise token overlap of ``c_org.py:18-39`` vs its MinHash scale
  substitute — here the roles are reversed (this is the exact oracle-side
  mode, CDC the approximation).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from dedup_ray.util.hashing import mix64

DEFAULT_MIN_LEN = 40  # chars; Lee et al. use 50 BPE tokens

_POLY = np.uint64(0x9E37_79B9_7F4A_7C55)  # odd -> invertible mod 2^64


def _text_array(t: pa.Table, col: str) -> pa.Array:
    arr = t[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pc.coalesce(arr, pa.scalar("", arr.type))


def _flat_codepoints(texts: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Flattened per-doc codepoint values + int64 offsets (len n+1).

    ASCII fast path: zero-copy view of the Arrow UTF-8 data buffer.
    Otherwise each doc decodes to UTF-32 (codepoints == SQL chars).
    """
    nchars = pc.utf8_length(texts).to_numpy(zero_copy_only=False)
    offsets = np.zeros(len(texts) + 1, np.int64)
    np.cumsum(nchars, out=offsets[1:])
    if isinstance(texts, pa.LargeStringArray):
        raw_off = np.frombuffer(texts.buffers()[1], np.int64,
                                len(texts) + 1, texts.offset * 8)
    else:
        raw_off = np.frombuffer(texts.buffers()[1], np.int32,
                                len(texts) + 1, texts.offset * 4)
    nbytes = int(raw_off[-1] - raw_off[0])
    if nbytes == 0:
        return np.empty(0, np.uint64), offsets
    if nbytes == int(offsets[-1]):  # pure ASCII: bytes are codepoints
        data = np.frombuffer(texts.buffers()[2], np.uint8,
                             nbytes, int(raw_off[0]))
        return data.astype(np.uint64), offsets
    vals = np.empty(int(offsets[-1]), np.uint32)
    for i, s in enumerate(texts.to_pylist()):
        if s:
            vals[offsets[i]:offsets[i + 1]] = np.frombuffer(
                s.encode("utf-32-le"), np.uint32)
    return vals.astype(np.uint64), offsets


def _window_hashes(
    vals: np.ndarray, offsets: np.ndarray, min_len: int, seed: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All valid L-window hashes of every doc, in document order.

    Returns ``(ghash, doc_idx, pos)``: for each valid window its 64-bit
    hash, owning doc index within the batch, and char start offset inside
    the doc.  Rolling polynomial via modular prefix sums: with
    ``T[k] = sum_{j<k} v[j] * Pinv^j`` the window polynomial
    ``sum v[i+j] * P^(L-1-j)`` equals ``P^(i+L-1) * (T[i+L] - T[i])`` —
    whole-batch array math, no per-window loop (same identity as the CDC
    chunk hasher, ``substring.py``).
    """
    L = min_len
    lens = np.diff(offsets)
    nvalid = np.maximum(lens - L + 1, 0)
    total = int(nvalid.sum())
    doc_idx = np.repeat(np.arange(len(lens)), nvalid)
    first = np.zeros(len(lens), np.int64)
    np.cumsum(nvalid, out=first[:])  # exclusive below
    pos = np.arange(total, dtype=np.int64) - np.repeat(
        first - nvalid, nvalid)
    starts = pos + offsets[:-1][doc_idx]
    if total == 0:
        return np.empty(0, np.uint64), doc_idx, pos

    n = len(vals)
    poly = (_POLY ^ mix64(np.array([seed], np.uint64))) | np.uint64(1)
    pinv = np.uint64(pow(int(poly), -1, 1 << 64))
    with np.errstate(over="ignore"):
        ppow = np.empty(n + 1, np.uint64)
        ppow[0] = 1
        np.cumprod(np.full(n, poly, np.uint64), out=ppow[1:])
        ipow = np.empty(n + 1, np.uint64)
        ipow[0] = 1
        np.cumprod(np.full(n, pinv, np.uint64), out=ipow[1:])
        T = np.zeros(n + 1, np.uint64)
        np.cumsum(vals * ipow[:n], out=T[1:])
        h = ppow[starts + L - 1] * (T[starts + L] - T[starts])
    return mix64(h), doc_idx, pos


def duplicated_grams(
    ds,
    text_col: str = "text",
    min_len: int = DEFAULT_MIN_LEN,
    seed: int = 0,
    num_partitions: int = 16,
):
    """Dataset of ``(ghash:int64, n:int64)`` for every L-window occurring
    more than once in the corpus.  Per-batch partials (``np.unique``), one
    narrow exchange, global sum, ``n >= 2`` filter inside the reducer."""
    from dedup_ray.util.exchange import exchange_group_apply

    def partial(t: pa.Table) -> pa.Table:
        vals, offsets = _flat_codepoints(_text_array(t, text_col))
        h, _, _ = _window_hashes(vals, offsets, min_len, seed)
        u, c = np.unique(h, return_counts=True)
        return pa.table({"ghash": pa.array(u.view(np.int64)),
                         "n": pa.array(c.astype(np.int64))})

    def reduce_dups(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({"ghash": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        g = part["ghash"].to_numpy(zero_copy_only=False)
        c = part["n"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(g, return_inverse=True)
        tot = np.zeros(len(u), np.int64)
        np.add.at(tot, inv, c)
        keep = tot >= 2
        return pa.table({"ghash": pa.array(u[keep]),
                         "n": pa.array(tot[keep])})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return exchange_group_apply(partials, "ghash", reduce_dups,
                                num_partitions)


def _dup_set_ref(dup_ds):
    """Sorted duplicated-gram hash set as a ``ray.put`` broadcast.

    Driver state is bounded by the number of DISTINCT duplicated windows
    (boilerplate volume), not corpus size; at 8 B/gram, 10^9 duplicated
    grams = 8 GB — past that, route per-doc gram rows through a second
    ``ghash``-keyed exchange joined against this table instead of
    broadcasting (same candidate-vs-broadcast trade as ``ops/relational``
    semi-joins)."""
    tbl = pa.concat_tables(
        [pa.table({"ghash": b["ghash"]}) for b in
         dup_ds.iter_batches(batch_format="pyarrow", batch_size=None)]
        or [pa.table({"ghash": pa.array([], pa.int64())})]
    )
    hashes = np.sort(
        tbl["ghash"].to_numpy(zero_copy_only=False).view(np.uint64))
    return ray.put(hashes)


def _dup_start_mask(h: np.ndarray, dup_sorted: np.ndarray) -> np.ndarray:
    if len(h) == 0 or len(dup_sorted) == 0:
        return np.zeros(len(h), bool)
    idx = np.searchsorted(dup_sorted, h)
    idx[idx == len(dup_sorted)] = 0
    return dup_sorted[idx] == h


def exact_substring_coverage(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = DEFAULT_MIN_LEN,
    seed: int = 0,
    num_partitions: int = 16,
    dup_ref=None,
):
    """Per-doc duplicated-substring coverage:
    ``(id_col, nchars, dup_chars)`` where ``dup_chars`` counts positions
    covered by some corpus-duplicated substring of length >= ``min_len``.

    Interval union without materializing intervals: duplicated window
    starts arrive sorted per doc, so covered chars =
    ``sum(first-in-doc ? L : min(L, gap to previous start))`` — the
    gaps-and-islands identity, one vectorized pass.
    """
    if dup_ref is None:
        dup_ref = _dup_set_ref(
            duplicated_grams(docs, text_col, min_len, seed,
                             num_partitions))

    def cover(t: pa.Table) -> pa.Table:
        dup_sorted = ray.get(dup_ref)
        vals, offsets = _flat_codepoints(_text_array(t, text_col))
        h, doc_idx, pos = _window_hashes(vals, offsets, min_len, seed)
        mask = _dup_start_mask(h, dup_sorted)
        d, p = doc_idx[mask], pos[mask]
        n = t.num_rows
        dup_chars = np.zeros(n, np.int64)
        if len(d):
            first = np.r_[True, d[1:] != d[:-1]]
            gaps = np.r_[np.int64(min_len), p[1:] - p[:-1]]
            contr = np.where(first, np.int64(min_len),
                             np.minimum(np.int64(min_len), gaps))
            np.add.at(dup_chars, d, contr)
        return pa.table({
            id_col: t[id_col],
            "nchars": pa.array(np.diff(offsets)),
            "dup_chars": pa.array(dup_chars),
        })

    return docs.map_batches(cover, batch_format="pyarrow")


def exact_substring_cut(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = DEFAULT_MIN_LEN,
    seed: int = 0,
    num_partitions: int = 16,
    dup_ref=None,
):
    """Remove every char covered by a duplicated >=L substring from every
    document (all-occurrence policy — see module docstring).  Output:
    ``(id_col, text)`` with the covered spans cut.

    Cover mask via a difference array over the flattened codepoints
    (+1 at each duplicated start, -1 at start+L; covered = running sum
    > 0); ASCII batches rebuild the string column directly from the kept
    bytes + new offsets with no per-doc Python.
    """
    if dup_ref is None:
        dup_ref = _dup_set_ref(
            duplicated_grams(docs, text_col, min_len, seed,
                             num_partitions))

    def cut(t: pa.Table) -> pa.Table:
        dup_sorted = ray.get(dup_ref)
        texts = _text_array(t, text_col)
        vals, offsets = _flat_codepoints(texts)
        h, doc_idx, pos = _window_hashes(vals, offsets, min_len, seed)
        mask = _dup_start_mask(h, dup_sorted)
        starts = (pos + offsets[:-1][doc_idx])[mask]
        flat_n = int(offsets[-1])
        delta = np.zeros(flat_n + 1, np.int32)
        if len(starts):
            np.add.at(delta, starts, 1)
            np.add.at(delta, starts + min_len, -1)  # windows fit in-doc
        keep = np.cumsum(delta[:-1]) == 0
        n = t.num_rows
        flat_doc = np.repeat(np.arange(n), np.diff(offsets))
        new_lens = np.bincount(flat_doc[keep], minlength=n).astype(np.int64)
        new_off = np.zeros(n + 1, np.int64)
        np.cumsum(new_lens, out=new_off[1:])
        kept_vals = vals[keep]
        if kept_vals.size == 0 or kept_vals.max(initial=0) < 128:
            data = kept_vals.astype(np.uint8)  # ASCII: direct rebuild
            out = pa.Array.from_buffers(
                pa.large_utf8(), n,
                [None, pa.py_buffer(new_off.tobytes()),
                 pa.py_buffer(data.tobytes())],
            )
        else:
            cp = kept_vals.astype(np.uint32)
            out = pa.array(
                [cp[new_off[i]:new_off[i + 1]].tobytes()
                 .decode("utf-32-le") for i in range(n)],
                pa.large_utf8(),
            )
        return pa.table({id_col: t[id_col], "text": out})

    return docs.map_batches(cut, batch_format="pyarrow")


def exact_substring_coverage_joined(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = DEFAULT_MIN_LEN,
    seed: int = 0,
    num_partitions: int = 16,
):
    """Join-back form of :func:`exact_substring_coverage` — the overflow
    path when the duplicated-gram set exceeds the broadcast budget
    (see ``_dup_set_ref``): instead of shipping the dup set to every
    task, per-window ``(ghash, id, pos)`` rows semi-join the dup table
    on a ``ghash``-keyed exchange, and a second exchange on the doc id
    reduces surviving starts to covered chars.  Trade: the window
    stream is O(corpus chars) rows through the first exchange — pay it
    only when the broadcast path cannot hold the dup set.  Output and
    semantics identical to the broadcast path (equality test)."""
    from dedup_ray.util.exchange import exchange_join, hash_exchange

    try:  # native id dtype (string urls OR int64 doc ids) for void blocks
        id_t = docs.schema().base_schema.field(id_col).type
    except Exception:
        id_t = pa.int64()

    dup = duplicated_grams(docs, text_col, min_len, seed, num_partitions)

    def windows(t: pa.Table) -> pa.Table:
        vals, offsets = _flat_codepoints(_text_array(t, text_col))
        h, doc_idx, pos = _window_hashes(vals, offsets, min_len, seed)
        ids = t[id_col].take(pa.array(doc_idx))
        return pa.table({
            "ghash": pa.array(h.view(np.int64)),
            id_col: ids,
            "pos": pa.array(pos),
        })

    def lengths(t: pa.Table) -> pa.Table:
        texts = _text_array(t, text_col)
        return pa.table({
            id_col: t[id_col],
            "nchars": pc.cast(pc.utf8_length(texts), pa.int64()),
        })

    win = docs.map_batches(windows, batch_format="pyarrow")
    hits = exchange_join(
        win, dup, on="ghash", how="semi",
        num_partitions=num_partitions,
        empty_schema=pa.schema([("ghash", pa.int64()),
                                (id_col, id_t),
                                ("pos", pa.int64())]),
    )
    lens = docs.map_batches(lengths, batch_format="pyarrow")

    def cover_part(t_hits: pa.Table, t_lens: pa.Table) -> pa.Table:
        if t_lens.num_rows == 0:
            void_t = t_lens[id_col].type if id_col in t_lens.column_names \
                else id_t
            return pa.table({
                id_col: pa.array([], void_t),
                "nchars": pa.array([], pa.int64()),
                "dup_chars": pa.array([], pa.int64()),
            })
        lid = t_lens[id_col].to_numpy(zero_copy_only=False)
        order_l = np.argsort(lid, kind="stable")
        lid_s = lid[order_l]
        nch = t_lens["nchars"].to_numpy(zero_copy_only=False)[order_l]
        dup_chars = np.zeros(len(lid_s), np.int64)
        if t_hits.num_rows and id_col in t_hits.column_names:
            hid = t_hits[id_col].to_numpy(zero_copy_only=False)
            pos = t_hits["pos"].to_numpy(zero_copy_only=False)
            o = np.lexsort((pos, hid))
            hid, pos = hid[o], pos[o]
            first = np.r_[True, hid[1:] != hid[:-1]]
            gaps = np.r_[np.int64(min_len), pos[1:] - pos[:-1]]
            contr = np.where(first, np.int64(min_len),
                             np.minimum(np.int64(min_len), gaps))
            tgt = np.searchsorted(lid_s, hid)
            np.add.at(dup_chars, tgt, contr)
        return pa.table({
            id_col: t_lens[id_col].take(pa.array(order_l)),
            "nchars": pa.array(nch),
            "dup_chars": pa.array(dup_chars),
        })

    return hash_exchange([hits, lens], [id_col, id_col], cover_part,
                         num_partitions)
