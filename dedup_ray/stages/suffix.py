"""Distributed truncated suffix-array construction — the EXACT-order path
of substring dedup (the reference pipeline's published ancestor is the
suffix-array dedup of Lee et al. 2022, "Deduplicating Training Data Makes
Language Models Better"; ``stages/exactsubstr.py`` implements its
hash-window form, this module the suffix-ARRAY form the north star names).

Semantics: over a corpus ``(doc_id, text)`` consider every suffix
``(doc_id, pos)``; order suffixes by their first ``L`` characters
(byte-lexicographic; ties broken by ``(doc_id, pos)``).  Truncation at
``L`` is principled for dedup: a match threshold of ``L`` characters makes
suffix order beyond depth ``L`` irrelevant, so the full prefix-doubling
ladder (Manber–Myers) collapses to ONE direct ranking pass — cheaper by
``log L`` all-to-alls than doubling, with identical output up to depth
``L``.

Distribution plan (one exchange, rank-exact for ANY boundary choice):

1. *Prefix extraction* (``map_batches``, no shuffle): each doc's UTF-8
   bytes are gathered into an ``n_positions × L`` byte matrix (vectorized
   numpy take off the Arrow buffers) and packed big-endian into
   ``L/8`` int64 words — integer tuple order == byte order (ASCII tops at
   0x7e so the sign bit never sets; the engine-wide int64-key rule holds).
   Zero padding ranks a short suffix before every extension, exactly like
   SQL's truncated ``substr``.
2. *Range bucketing on word 0*: boundaries come from a deterministic
   keyed-hash sample (the ``range_rank`` trick).  Bucketing on the first
   8 chars only can skew a bucket under pathological corpora (all docs
   sharing an 8-char prefix) — that costs load balance, never
   correctness, because equal prefixes always share word 0 and therefore
   a bucket: group-local first-occurrence decisions are globally valid.
3. *Per-bucket rank*: exact per-bucket ROW counts (tiny: B ints) cumsum
   into global offsets; each bucket lexsorts ``(w0..wk, doc_id, pos)``
   locally.  Global rank = offset + local position.

At 100 TB the prefix matrix is the stated cost: ``L`` bytes per corpus
position through one all-to-all (L=16 → 16× corpus volume).  That is the
price of EXACT order — the hash path (``exactsubstr``) ships 8 bytes per
position and tolerates collisions; pick per tier.  Positions are BYTE
offsets (== character offsets on ASCII corpora, which the DuckDB oracle
requires; UTF-8 byte order still equals codepoint order otherwise).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "suffix_prefix_words",
    "suffix_array",
    "sa_repeat_coverage",
]


def _flat_utf8(col) -> tuple[np.ndarray, np.ndarray]:
    """Arrow string column → (flat uint8 bytes, int64 offsets)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.coalesce(col, pa.scalar("", col.type))
    if pa.types.is_large_string(col.type):
        off = np.frombuffer(col.buffers()[1], np.int64, len(col) + 1,
                            col.offset * 8).astype(np.int64)
    else:
        off = np.frombuffer(col.buffers()[1], np.int32, len(col) + 1,
                            col.offset * 4).astype(np.int64)
    nbytes = int(off[-1] - off[0])
    data = (np.frombuffer(col.buffers()[2], np.uint8, nbytes, int(off[0]))
            if nbytes else np.zeros(0, np.uint8))
    return data, off - off[0]


def suffix_prefix_words(t: pa.Table, id_col: str, text_col: str,
                        depth: int = 16,
                        max_pos: int | None = None) -> pa.Table:
    """One block → ``(id_col, pos, w0..wk)``: every suffix position with
    its first ``depth`` bytes packed big-endian into ``depth//8`` int64
    words.  Pure numpy gather — no per-row Python."""
    assert depth % 8 == 0 and depth > 0
    n_words = depth // 8
    data, off = _flat_utf8(t[text_col])
    lens = np.diff(off)
    eff = np.minimum(lens, max_pos) if max_pos is not None else lens
    total = int(eff.sum())
    id_arr = t[id_col]
    if total == 0:
        cols = {id_col: pa.array([], id_arr.type),
                "pos": pa.array([], pa.int64())}
        for w in range(n_words):
            cols[f"w{w}"] = pa.array([], pa.int64())
        return pa.table(cols)
    doc_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), eff)
    starts = np.zeros(t.num_rows, np.int64)
    starts[1:] = np.cumsum(eff)[:-1]
    pos = np.arange(total, dtype=np.int64) - starts[doc_idx]
    # byte matrix: row i = text bytes [start+pos : start+pos+depth],
    # zero-padded past the doc end (pad byte 0 < every ASCII byte, so a
    # short suffix sorts before all its extensions — SQL substr order)
    abs_start = off[doc_idx] + pos
    idx = abs_start[:, None] + np.arange(depth, dtype=np.int64)[None, :]
    valid = idx < off[doc_idx + 1][:, None]
    mat = np.where(valid, data[np.minimum(idx, len(data) - 1)], 0)
    # pack big-endian into int64 words: tuple order == byte order (ASCII
    # keeps the sign bit clear; engine-wide int64-key rule)
    words = np.ascontiguousarray(mat, dtype=np.uint8).reshape(
        total, n_words, 8)
    packed = np.zeros((total, n_words), np.uint64)
    for b in range(8):
        packed = (packed << np.uint64(8)) | words[:, :, b].astype(np.uint64)
    cols = {id_col: id_arr.take(pa.array(doc_idx)),
            "pos": pa.array(pos)}
    for w in range(n_words):
        cols[f"w{w}"] = pa.array(packed[:, w].view(np.int64))
    return pa.table(cols)


def _sample_boundaries(prefix_ds, sample_rate: float, seed: int,
                       num_partitions: int) -> np.ndarray:
    """Deterministic keyed-hash sample of w0 → sorted range boundaries.
    Boundaries steer only load balance; ranks stay exact regardless."""
    from dedup_ray.util.hashing import mix64

    thresh = np.uint64(max(int(sample_rate * 2**64), 1))

    def sampled(t: pa.Table) -> pa.Table:
        if "w0" not in t.column_names or t.num_rows == 0:
            return pa.table({"w0": pa.array([], pa.int64())})
        w0 = t["w0"].to_numpy(zero_copy_only=False)
        pos = t["pos"].to_numpy(zero_copy_only=False)
        h = mix64(w0.view(np.uint64)
                  + np.uint64(seed) * np.uint64(0x9E3779B97F4A7C15)
                  + pos.view(np.uint64))
        return pa.table({"w0": pa.array(w0[h < thresh])})

    sample = np.sort(np.concatenate(
        [b["w0"].to_numpy(zero_copy_only=False)
         for b in prefix_ds.map_batches(sampled, batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow", batch_size=None)]
        or [np.array([], np.int64)]
    ))
    if not len(sample):
        return np.array([], np.int64)
    return np.unique(sample[
        (np.linspace(0, 1, num_partitions + 1)[1:-1]
         * (len(sample) - 1)).astype(np.int64)
    ])


def _bucketed_prefixes(ds, id_col, text_col, depth, max_pos,
                       sample_rate, seed, num_partitions):
    """Prefix table with a range bucket column, materialized once, plus
    the per-bucket row counts (``bucket`` ascending)."""

    def extract(t: pa.Table) -> pa.Table:
        return suffix_prefix_words(t, id_col, text_col, depth, max_pos)

    prefixes = ds.select_columns([id_col, text_col]).map_batches(
        extract, batch_format="pyarrow").materialize()
    picks = _sample_boundaries(prefixes, sample_rate, seed, num_partitions)

    def assign(t: pa.Table) -> pa.Table:
        if "w0" not in t.column_names:
            return t
        w0 = t["w0"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array(np.searchsorted(picks, w0, side="right")
                               .astype(np.int64)))

    with_bkt = prefixes.map_batches(assign, batch_format="pyarrow") \
        .materialize()
    if with_bkt.count() == 0:  # empty corpus: groupby would drop schema
        import pandas as pd

        return with_bkt, pd.DataFrame({"bucket": [], "count()": []})
    counts = with_bkt.groupby("bucket").count().to_pandas()
    return with_bkt, counts.sort_values("bucket")


def suffix_array(ds, id_col: str = "doc_id", text_col: str = "text",
                 depth: int = 16, max_pos: int | None = None,
                 sample_rate: float = 0.02, seed: int = 7,
                 num_partitions: int = 16):
    """Truncated suffix array: ``(id_col, pos, srank)`` where ``srank`` is
    the 0-based global rank ordered by (first-``depth``-bytes, id, pos) —
    a total order, so ranks are a permutation of ``range(n_positions)``.
    One range exchange; exact for any sampled boundary set."""
    import ray

    from dedup_ray.util.exchange import exchange_group_apply

    n_words = depth // 8
    with_bkt, counts = _bucketed_prefixes(
        ds, id_col, text_col, depth, max_pos, sample_rate, seed,
        num_partitions)
    if counts.empty:
        import ray.data

        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "pos": pa.array([], pa.int64()),
            "srank": pa.array([], pa.int64()),
        }))
    buckets = counts["bucket"].to_numpy()
    offsets = np.r_[0, np.cumsum(counts["count()"].to_numpy())[:-1]]
    offset_ref = ray.put((buckets, offsets))

    def rank_part(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            id_t = part[id_col].type if id_col in part.column_names \
                else pa.int64()
            return pa.table({id_col: pa.array([], id_t),
                             "pos": pa.array([], pa.int64()),
                             "srank": pa.array([], pa.int64())})
        bks, offs = ray.get(offset_ref)
        ids = part[id_col].to_numpy(zero_copy_only=False)
        pos = part["pos"].to_numpy(zero_copy_only=False)
        bkt = part["bucket"].to_numpy(zero_copy_only=False)
        keys = [pos, ids] + [
            part[f"w{w}"].to_numpy(zero_copy_only=False)
            for w in range(n_words - 1, -1, -1)
        ] + [bkt]
        order = np.lexsort(keys)
        bkt_s = bkt[order]
        first = np.r_[True, bkt_s[1:] != bkt_s[:-1]]
        local = np.arange(len(order), dtype=np.int64)
        base = np.repeat(local[first], np.diff(
            np.r_[np.flatnonzero(first), len(order)]))
        rank = offs[np.searchsorted(bks, bkt_s)] + (local - base)
        return pa.table({
            id_col: pa.array(ids[order], part[id_col].type),
            "pos": pa.array(pos[order]),
            "srank": pa.array(rank),
        })

    return exchange_group_apply(with_bkt, "bucket", rank_part,
                                num_partitions)


def sa_repeat_coverage(ds, id_col: str = "doc_id", text_col: str = "text",
                       depth: int = 16, max_pos: int | None = None,
                       sample_rate: float = 0.02, seed: int = 7,
                       num_partitions: int = 16):
    """Per-doc duplicated-position census via the suffix array: a position
    is DUPLICATED when its ``depth``-byte prefix has an earlier occurrence
    in ``(prefix, id, pos)`` order — the exact keep-first/cut-rest
    semantics of Lee et al. 2022, hash-free.  Equal prefixes share word 0
    and therefore a range bucket, so first-occurrence decisions are
    group-local.  Output: ``(id_col, n_pos, n_dup_pos)`` per doc with
    ``n_pos`` the number of (possibly capped) suffix positions.

    The per-bucket pass emits PARTIAL per-doc counts (≤ docs × buckets
    rows); one small ``groupby().sum()`` folds them — no second wide
    exchange."""
    from dedup_ray.util.exchange import exchange_group_apply

    n_words = depth // 8
    with_bkt, counts = _bucketed_prefixes(
        ds, id_col, text_col, depth, max_pos, sample_rate, seed,
        num_partitions)
    if counts.empty:
        import ray.data

        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "n_pos": pa.array([], pa.int64()),
            "n_dup_pos": pa.array([], pa.int64()),
        }))

    def census_part(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            id_t = part[id_col].type if id_col in part.column_names \
                else pa.int64()
            return pa.table({id_col: pa.array([], id_t),
                             "n_pos": pa.array([], pa.int64()),
                             "n_dup_pos": pa.array([], pa.int64())})
        ids = part[id_col].to_numpy(zero_copy_only=False)
        pos = part["pos"].to_numpy(zero_copy_only=False)
        words = [part[f"w{w}"].to_numpy(zero_copy_only=False)
                 for w in range(n_words)]
        order = np.lexsort([pos, ids] + words[::-1])
        same = np.ones(len(order), bool)
        same[0] = False
        for w in words:
            ws = w[order]
            same[1:] &= ws[1:] == ws[:-1]
        ids_s = ids[order]
        # per-doc totals and duplicated counts in this bucket
        uniq, inv = np.unique(ids_s, return_inverse=True)
        n_pos = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        n_dup = np.bincount(inv, weights=same.astype(np.float64),
                            minlength=len(uniq)).astype(np.int64)
        return pa.table({
            id_col: pa.array(uniq, part[id_col].type),
            "n_pos": pa.array(n_pos),
            "n_dup_pos": pa.array(n_dup),
        })

    partials = exchange_group_apply(with_bkt, "bucket", census_part,
                                    num_partitions)
    agg = partials.groupby(id_col).sum(["n_pos", "n_dup_pos"])

    def clean(t: pa.Table) -> pa.Table:
        cols = {id_col: t[id_col]}
        cols["n_pos"] = pc.cast(t["sum(n_pos)"], pa.int64())
        cols["n_dup_pos"] = pc.cast(t["sum(n_dup_pos)"], pa.int64())
        return pa.table(cols)

    return agg.map_batches(clean, batch_format="pyarrow")
