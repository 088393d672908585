"""Exact-substring duplicate detection via content-defined chunking.

North-rule third candidate path ("suffix-array-based exact substring dedup").
A single global suffix array over 10^12 documents is not partitionable, so
the engine uses the distribution-friendly equivalent: **content-defined
chunking (CDC)** with a fixed-window Rabin-Karp rolling hash.  Chunk
boundaries depend only on local content, so any sufficiently long substring
shared by two documents chunkifies identically in both (except the partial
boundary chunks) regardless of where the documents were partitioned —
the property a suffix array provides globally, obtained locally.

Plan: per-doc chunk fingerprints (fused into the signature pass) → explode
(chunk_hash, doc_id) → groupby(chunk_hash) candidate pairs (same hot-key cap
policy as LSH banding) → verify by the longest run of *consecutive* shared
chunks (== a real common substring) ≥ ``min_substring_len`` chars.

Approximation, documented per SURVEY.md §7.3: shared substrings shorter than
~2 average chunk lengths may not contain a complete chunk and can be missed;
boundary partial chunks are not counted toward the run length.  Both err
toward under-counting (precision-safe).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from dedup_ray.config import DedupConfig
from dedup_ray.util.hashing import stable64

_WINDOW = 16  # rolling-hash window (bytes)
_POLY = np.uint64(0x3B97_8D44_62D9_1E1B)  # odd multiplier


def _gear_table(seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed ^ 0xCDC)
    return rng.integers(0, 1 << 63, size=256, dtype=np.uint64)


class _CDC:
    """Reusable chunker state (gear table + precomputed window coefficients)."""

    def __init__(self, cfg: DedupConfig) -> None:
        self.cfg = cfg
        self.gear = _gear_table(cfg.seed)
        with np.errstate(over="ignore"):
            self.coef = np.empty(_WINDOW, dtype=np.uint64)
            c = np.uint64(1)
            for j in range(_WINDOW):
                self.coef[j] = c
                c = c * _POLY
        # anchor when (hash & mask) == 0 → expected chunk = avg_chunk bytes
        self.avg_chunk = max(16, cfg.min_substring_len // 2)
        self.mask = np.uint64(2 ** int(np.log2(self.avg_chunk)) - 1)
        self.min_chunk = 8
        self.max_chunk = self.avg_chunk * 8

    def chunks(self, data: bytes, doc_key: str) -> tuple[list[int], list[int]]:
        """→ (chunk content hashes, chunk byte lengths)."""
        n = len(data)
        if n == 0:
            return [stable64(f"\x00chunk-sentinel:{doc_key}", seed=self.cfg.seed)], [0]
        b = np.frombuffer(data, dtype=np.uint8)
        g = self.gear[b]
        if n <= _WINDOW:
            bounds = [n]
        else:
            with np.errstate(over="ignore"):
                h = np.zeros(n - _WINDOW + 1, dtype=np.uint64)
                for j in range(_WINDOW):
                    h += g[j : n - _WINDOW + 1 + j] * self.coef[_WINDOW - 1 - j]
            anchor_pos = np.nonzero((h & self.mask) == 0)[0] + _WINDOW
            bounds, last = [], 0
            for p in anchor_pos.tolist():
                if p - last >= self.min_chunk:
                    # enforce max chunk by splitting long gaps
                    while p - last > self.max_chunk:
                        last += self.max_chunk
                        bounds.append(last)
                    bounds.append(p)
                    last = p
            while n - last > self.max_chunk:
                last += self.max_chunk
                bounds.append(last)
            if not bounds or bounds[-1] != n:
                bounds.append(n)
        hashes, lens, prev = [], [], 0
        for bd in bounds:
            hashes.append(stable64(data[prev:bd], seed=self.cfg.seed))
            lens.append(bd - prev)
            prev = bd
        return hashes, lens


def pack_chunks(hashes: list[int], lens: list[int]) -> bytes:
    """Serialize one doc's chunk fingerprint sequence to a binary blob.

    Layout: n hashes ('<u8') then n lens ('<i4').  A plain binary column
    survives Acero joins (list-typed payload columns do not).
    """
    return (
        np.asarray(hashes, dtype="<u8").tobytes()
        + np.asarray(lens, dtype="<i4").tobytes()
    )


def unpack_chunks(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    """→ (chunk hashes as SIGNED int64 view, chunk byte lens).

    Hashes are reinterpreted as int64 everywhere they appear in columns/sets:
    uint64 values above 2^63 overflow when Ray round-trips groups through
    pandas (groupby/map_groups), so signed views are the engine-wide key type.
    """
    n = len(blob) // 12
    return (
        np.frombuffer(blob, dtype="<u8", count=n).view("<i8"),
        np.frombuffer(blob, dtype="<i4", count=n, offset=8 * n),
    )


def chunk_batch(texts: list[str | None], ids: list, cfg: DedupConfig,
                cdc: _CDC | None = None) -> pa.Array:
    """Per-doc CDC fingerprints as one packed binary column ``chunks``."""
    cdc = cdc or _CDC(cfg)
    blobs = []
    for t, i in zip(texts, ids):
        h, ln = cdc.chunks((t or "").encode("utf-8", "surrogatepass"), str(i))
        blobs.append(pack_chunks(h, ln))
    return pa.array(blobs, pa.binary())


def explode_chunks(compact_ds, config: DedupConfig, id_col: str = "url"):
    """(id, chunk_hashes, chunk_lens) → (id, chash) rows, short chunks dropped.

    Chunks shorter than min_chunk*2 bytes are too common to be discriminative
    (and cannot alone satisfy min_substring_len); dropping them bounds the
    shuffle. The verify step re-reads the full per-doc chunk sequence, so
    recall of long runs is unaffected.
    """

    def f(batch: pa.Table) -> pa.Table:
        ids_out, h_out = [], []
        ids = batch[id_col].to_pylist()
        for i, blob in zip(ids, batch["chunks"].to_pylist()):
            hh, ll = unpack_chunks(blob)
            for h, l in zip(hh.tolist(), ll.tolist()):
                if l >= 16:
                    ids_out.append(i)
                    h_out.append(h)
        return pa.table(
            {id_col: pa.array(ids_out), "chash": pa.array(h_out, pa.int64())}
        )

    return compact_ds.map_batches(f, batch_format="pyarrow",
                                  batch_size=config.batch_size)


def chunk_candidate_pairs(chunk_rows, config: DedupConfig, id_col: str = "url"):
    """Hash-partition on chash → distinct candidate pairs, hot-key capped
    like LSH (vectorized per partition, not per bucket)."""
    from dedup_ray.stages.lsh import _emit_pairs
    from dedup_ray.util.dsutil import partitioned_group_apply

    cfg = config

    def buckets_to_pairs(part: pd.DataFrame) -> pd.DataFrame:
        out1: list = []
        out2: list = []
        for _, sub in part.groupby("chash", sort=False):
            ids = sub[id_col].drop_duplicates().tolist()
            if len(ids) < 2:
                continue
            id1s, id2s, _ = _emit_pairs(ids, cfg.max_band_group, cfg.hot_window)
            out1.extend(id1s)
            out2.extend(id2s)
        return pd.DataFrame({"id1": out1, "id2": out2})

    pairs = partitioned_group_apply(
        chunk_rows, ["chash"], buckets_to_pairs, cfg.num_partitions
    )

    def dedup(part: pd.DataFrame) -> pd.DataFrame:
        return part.drop_duplicates(subset=["id1", "id2"])

    return partitioned_group_apply(pairs, ["id1", "id2"], dedup, cfg.num_partitions)


def longest_shared_run(
    h1: list[int], l1: list[int], h2: list[int], skip=None
) -> int:
    """Longest common *consecutive* chunk run, in bytes of doc1's chunks.

    Sparse DP over matching positions: O(matches) per pair; chunk sequences
    are short (~len/avg_chunk).  Chunks in ``skip`` (boilerplate) neither
    match nor extend a run.
    """
    pos2: dict[int, list[int]] = {}
    for j, h in enumerate(h2):
        if skip is None or h not in skip:
            pos2.setdefault(h, []).append(j)
    best = 0
    prev: dict[int, int] = {}  # j -> run byte length ending at (i-1, j-1)
    for i, h in enumerate(h1):
        cur: dict[int, int] = {}
        for j in pos2.get(h, ()):
            run = prev.get(j - 1, 0) + l1[i]
            cur[j] = run
            if run > best:
                best = run
        prev = cur
    return best


def verify_substring_pairs(pairs_ds, compact_ds, config: DedupConfig,
                           id_col: str = "url", hot_chunks=None):
    """Candidates → accepted edges where a shared chunk run ≥ min_substring_len.

    ``hot_chunks`` (frozenset of boilerplate chunk hashes, broadcast via
    ``ray.put`` — SURVEY.md J5 pattern) are excluded from runs, so two pages
    sharing only a cookie banner never merge.
    """
    from dedup_ray.stages.verify import _rename

    from dedup_ray.stages.verify import empty_edges

    cfg = config
    pairs_ds = pairs_ds.materialize()
    if pairs_ds.count() == 0:
        return empty_edges({"shared_bytes": pa.int64()})
    from dedup_ray.util.dsutil import hash_join

    side = compact_ds.select_columns([id_col, "chunks"])
    s1 = _rename(side, {id_col: "id1", "chunks": "ch1"})
    s2 = _rename(side, {id_col: "id2", "chunks": "ch2"})
    joined = hash_join(
        pairs_ds.select_columns(["id1", "id2"]),
        s1,
        on="id1",
        left_cols=["id1", "id2"],
        right_cols=["id1", "ch1"],
        num_partitions=cfg.num_partitions,
    )
    joined = hash_join(
        joined,
        s2,
        on="id2",
        left_cols=["id1", "id2", "ch1"],
        right_cols=["id2", "ch2"],
        num_partitions=cfg.num_partitions,
    )

    import ray

    hot_ref = ray.put(hot_chunks if hot_chunks is not None else frozenset())

    def keep(batch: pa.Table) -> pa.Table:
        skip = ray.get(hot_ref)
        id1, id2 = batch["id1"].to_pylist(), batch["id2"].to_pylist()
        k1, k2, runs = [], [], []
        for a, b, blob1, blob2 in zip(
            id1, id2, batch["ch1"].to_pylist(), batch["ch2"].to_pylist()
        ):
            h1, l1 = unpack_chunks(blob1)
            h2, l2 = unpack_chunks(blob2)
            r = longest_shared_run(h1.tolist(), l1.tolist(), h2.tolist(), skip)
            smaller = max(1, min(int(l1.sum()), int(l2.sum())))
            if r >= cfg.min_substring_len and r / smaller >= cfg.containment_frac:
                k1.append(a)
                k2.append(b)
                runs.append(r)
        return pa.table(
            {
                "id1": pa.array(k1, pa.string()),
                "id2": pa.array(k2, pa.string()),
                "shared_bytes": pa.array(runs, pa.int64()),
            }
        )

    return joined.map_batches(keep, batch_format="pyarrow")


def boilerplate_chunks(chunk_rows, config: DedupConfig) -> frozenset:
    """Global chunk-DF census → chunk hashes present in > boilerplate_max_df docs.

    The reference's only corpus-global barrier is the IDF fan-in
    (``IDF.py:12-17`` / SURVEY.md A1); this is its analog for the web
    payload: a groupby(chash).count() whose heavy tail (boilerplate) is
    collected to the driver and broadcast.  The tail is tiny by construction
    (only keys with df > threshold).
    """
    import pyarrow.compute as pc

    counts = chunk_rows.groupby("chash").count()
    hot = counts.map_batches(
        lambda t: t.filter(pc.greater(t["count()"], config.boilerplate_max_df)),
        batch_format="pyarrow",
    ).take_all()
    return frozenset(r["chash"] for r in hot)


def substring_edges(compact_ds, config: DedupConfig, id_col: str = "url"):
    """Full substring path: chunks → DF census → candidates → verified edges."""
    import pyarrow.compute as pc
    import ray

    rows = explode_chunks(compact_ds, config, id_col).materialize()
    hot = boilerplate_chunks(rows, config)
    if hot:
        hot_arr_ref = ray.put(np.array(sorted(hot), dtype=np.int64))

        def drop_hot(batch: pa.Table) -> pa.Table:
            hot_arr = ray.get(hot_arr_ref)
            ch = batch["chash"].to_numpy(zero_copy_only=False)
            idx = np.searchsorted(hot_arr, ch)
            idx[idx >= len(hot_arr)] = 0
            is_hot = hot_arr[idx] == ch
            return batch.filter(pa.array(~is_hot))

        rows = rows.map_batches(drop_hot, batch_format="pyarrow")
    cands = chunk_candidate_pairs(rows, config, id_col)
    return verify_substring_pairs(cands, compact_ds, config, id_col, hot_chunks=hot)
