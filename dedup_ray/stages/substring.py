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
        # Seed-dependent odd multiplier: the polynomial body itself is
        # keyed, so same-length colliding chunks are no longer constructible
        # from the public structure alone (the splitmix finalizer is a
        # bijection and would not protect an unkeyed body).
        from dedup_ray.util.hashing import mix64

        self.poly = np.uint64(
            int(mix64(np.array([cfg.seed], dtype=np.uint64))[0]) | 1
        ) ^ _POLY
        self.poly |= np.uint64(1)
        self.pinv = np.uint64(pow(int(self.poly), -1, 1 << 64))
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

    def segment_hashes(
        self, b_u64: np.ndarray, starts: np.ndarray, ends: np.ndarray
    ) -> np.ndarray:
        """Vectorized content hash of byte segments [starts[i], ends[i]).

        Wraparound-u64 polynomial via prefix sums: with T[i] = Σ_{j<i}
        b[j]·P⁻ʲ and Ppow[i] = Pⁱ, the segment polynomial Σ b[j]·P^{e-1-j}
        equals Ppow[e-1]·(T[e]−T[s]); a splitmix finalizer over (value,
        length, seed) spreads it.  Replaces one Python BLAKE2b call per
        chunk — the former per-task hot spot — with whole-doc array math.
        P is odd, hence invertible mod 2^64, so P⁻¹ is exact.
        """
        n = len(b_u64)
        with np.errstate(over="ignore"):
            pinv_pow = np.empty(n, dtype=np.uint64)
            pinv_pow[0] = 1
            np.cumprod(np.full(n - 1, self.pinv, dtype=np.uint64), out=pinv_pow[1:]) if n > 1 else None
            ppow = np.empty(n, dtype=np.uint64)
            ppow[0] = 1
            np.cumprod(np.full(n - 1, self.poly, dtype=np.uint64), out=ppow[1:]) if n > 1 else None
            T = np.zeros(n + 1, dtype=np.uint64)
            np.cumsum(b_u64 * pinv_pow, out=T[1:])
            seg = ppow[ends - 1] * (T[ends] - T[starts])
            from dedup_ray.util.hashing import _GOLDEN, mix64

            lens = (ends - starts).astype(np.uint64)
            return mix64(seg + _GOLDEN * lens + np.uint64(self.cfg.seed))

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
        bounds_np = np.asarray(bounds, dtype=np.int64)
        starts = np.r_[np.int64(0), bounds_np[:-1]]
        hashes = self.segment_hashes(b.astype(np.uint64), starts, bounds_np)
        return hashes.tolist(), (bounds_np - starts).tolist()


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
            hs = hh[ll >= 16]
            if len(hs):
                h_out.append(hs)
                ids_out.append(np.repeat(np.array(i, dtype=object), len(hs)))
        if not h_out:
            # id dtype follows the BATCH (string urls OR int64 doc ids):
            # a hardcoded string empty would schema-clash with the typed
            # blocks of an int64 corpus whenever one batch has no chunks
            return pa.table(
                {
                    id_col: pa.array([], batch.schema.field(id_col).type),
                    "chash": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                id_col: pa.array(np.concatenate(ids_out)),
                "chash": pa.array(np.concatenate(h_out), pa.int64()),
            }
        )

    return compact_ds.map_batches(f, batch_format="pyarrow",
                                  batch_size=config.batch_size)


def chunk_buckets_with_census(chunk_rows, config: DedupConfig,
                              id_col: str = "url", id_type=None):
    """ONE chash-partitioned shuffle emitting candidate pairs AND the
    boilerplate census.

    Every chash group lands whole in one partition, so a group's document
    frequency is exact locally — the corpus-global IDF-style census
    (SURVEY.md A1, ``IDF.py:12-17`` analog) fuses into the bucket pass
    instead of being a separate groupby barrier.  Output rows are either
    candidate pairs ``(id1, id2, hot_chash=NULL)`` or boilerplate markers
    ``(NULL, NULL, hot_chash)`` for chunks with df > ``boilerplate_max_df``
    (cookie banners, templates) — those are skipped for pair emission and
    excluded from shared-run scoring by the verifier.
    """
    from dedup_ray.stages.lsh import emit_bucket_pairs
    from dedup_ray.util.dsutil import partitioned_group_apply

    cfg = config

    def buckets(part: pd.DataFrame, id_type) -> pa.Table:
        pairs, (hot,) = emit_bucket_pairs(
            part,
            ["chash"],
            id_col,
            cfg.max_band_group,
            cfg.hot_window,
            max_df=cfg.boilerplate_max_df,
        )
        n_pairs = len(pairs)
        # int64 chash values use the full signed-64 range; arrow int64 with
        # nulls carries them exactly (a float column would corrupt > 2^53)
        return pa.table(
            {
                "id1": pa.array(
                    list(pairs["id1"]) + [None] * len(hot), id_type
                ),
                "id2": pa.array(
                    list(pairs["id2"]) + [None] * len(hot), id_type
                ),
                "hot_chash": pa.array(
                    [None] * n_pairs + [int(h) for h in hot], pa.int64()
                ),
            }
        )

    from dedup_ray.util.exchange import exchange_group_apply

    def buckets_arrow(part: pa.Table) -> pa.Table:
        # id dtype follows the corpus (string urls OR int64 doc ids)
        return buckets(part.to_pandas(), part.schema.field(id_col).type)

    return exchange_group_apply(
        chunk_rows,
        "chash",
        buckets_arrow,
        cfg.num_partitions,
        # entirely-empty corpus → all blocks void; caller supplies id dtype
        empty_schema=pa.schema(
            [(id_col, id_type or pa.string()), ("chash", pa.int64())]
        ),
    )


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
                           id_col: str = "url", hot_chunks=None,
                           id_type=None):
    """Candidates → accepted edges where a shared chunk run ≥ min_substring_len.

    ``hot_chunks`` (frozenset of boilerplate chunk hashes, broadcast via
    ``ray.put`` — SURVEY.md J5 pattern) are excluded from runs, so two pages
    sharing only a cookie banner never merge.  ``id_type`` is the native
    Arrow dtype of the id column (string urls OR int64 doc ids); it only
    shapes the zero-candidate empty schemas — non-empty paths take the
    type from the data.
    """
    from dedup_ray.stages.verify import _rename
    from dedup_ray.util.exchange import exchange_join

    cfg = config
    idt = id_type if id_type is not None else pa.string()

    side = compact_ds.select_columns([id_col, "chunks"])
    s1 = _rename(side, {id_col: "id1", "chunks": "ch1"})
    s2 = _rename(side, {id_col: "id2", "chunks": "ch2"})

    def dedup_pairs(t: pa.Table) -> pa.Table:
        # pairs duplicate once per shared chunk; the exchange co-locates
        # all (id1, *) rows, so a partition-local dedup is globally exact
        import pandas as pd

        mask = ~pd.DataFrame(
            {"a": t["id1"].to_pandas(), "b": t["id2"].to_pandas()}
        ).duplicated().to_numpy()
        if mask.all():
            return t
        return t.filter(pa.array(mask))

    ch_t = pa.binary()
    joined = exchange_join(
        pairs_ds.select_columns(["id1", "id2"]),
        s1,
        on="id1",
        num_partitions=cfg.num_partitions,
        left_prep=dedup_pairs,
        empty_schema=pa.schema(
            [("id1", idt), ("id2", idt), ("ch1", ch_t)]
        ),
        return_refs=True,  # chained straight into the id2 exchange
    )
    joined = exchange_join(
        joined,
        s2,
        on="id2",
        num_partitions=cfg.num_partitions,
        empty_schema=pa.schema(
            [
                ("id1", idt),
                ("id2", idt),
                ("ch1", ch_t),
                ("ch2", ch_t),
            ]
        ),
    )

    import ray

    hot_ref = ray.put(hot_chunks if hot_chunks is not None else frozenset())

    def keep(batch: pa.Table) -> pa.Table:
        skip = ray.get(hot_ref)
        skip_arr = (
            np.fromiter(skip, dtype=np.int64, count=len(skip))
            if skip
            else None
        )
        id1, id2 = batch["id1"].to_pylist(), batch["id2"].to_pylist()
        k1, k2, runs = [], [], []
        for a, b, blob1, blob2 in zip(
            id1, id2, batch["ch1"].to_pylist(), batch["ch2"].to_pylist()
        ):
            h1, l1 = unpack_chunks(blob1)
            h2, l2 = unpack_chunks(blob2)
            smaller = max(1, min(int(l1.sum()), int(l2.sum())))
            # Cheap necessary-condition prefilter before the O(matches) DP:
            # a shared run of R bytes implies the total bytes of doc1
            # chunks whose hashes appear in doc2 is >= R.  Vectorized
            # intersection bounds that total; most non-containment pairs
            # (scattered shared shingles/boilerplate) fail here.
            shared_mask = np.isin(h1, h2)
            if skip_arr is not None and shared_mask.any():
                shared_mask &= ~np.isin(h1, skip_arr)
            ub = int(l1[shared_mask].sum())
            if ub < cfg.min_substring_len or ub / smaller < cfg.containment_frac:
                continue
            r = longest_shared_run(h1.tolist(), l1.tolist(), h2.tolist(), skip)
            if r >= cfg.min_substring_len and r / smaller >= cfg.containment_frac:
                k1.append(a)
                k2.append(b)
                runs.append(r)
        out_idt = batch.schema.field("id1").type
        return pa.table(
            {
                "id1": pa.array(k1, out_idt),
                "id2": pa.array(k2, out_idt),
                "shared_bytes": pa.array(runs, pa.int64()),
            }
        )

    return joined.map_batches(keep, batch_format="pyarrow")


def substring_edges(compact_ds, config: DedupConfig, id_col: str = "url",
                    id_type=None):
    """Full substring path: chunks → fused census+buckets → verified edges.

    Plan: explode chunk rows (streaming) → ONE chash shuffle emitting both
    candidate pairs and the boilerplate census → driver collects the tiny
    hot set → global (id1,id2) dedup (pairs duplicate once per shared
    chunk, so this shuffle pays for itself many times over in avoided
    DP verification) → shared-run verification.
    """
    import pyarrow.compute as pc

    rows = explode_chunks(compact_ds, config, id_col)
    mixed = chunk_buckets_with_census(
        rows, config, id_col, id_type
    ).materialize()

    hot_rows = mixed.map_batches(
        lambda t: t.filter(pc.is_valid(t["hot_chash"])).select(["hot_chash"]),
        batch_format="pyarrow",
    )
    hot = frozenset(r["hot_chash"] for r in hot_rows.take_all())

    # Batch-local pair dedup only (a pair repeats once per shared chunk,
    # often ~100x): shrinks the narrow stream cheaply.  The GLOBAL dedup
    # rides the first verify exchange — its split wave co-partitions all
    # (id1, *) rows before the chunk blobs are attached, so left_prep
    # dedups exactly where a dedicated all-to-all round used to.
    def local_dedup(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"id1": t["id1"].to_pandas(), "id2": t["id2"].to_pandas()}
        )
        mask = ~df.duplicated().to_numpy()
        return t.filter(pa.array(mask)) if not mask.all() else t

    pairs = mixed.map_batches(
        lambda t: local_dedup(
            t.filter(pc.is_valid(t["id1"])).select(["id1", "id2"])
        ),
        batch_format="pyarrow",
    )
    return verify_substring_pairs(pairs, compact_ds, config, id_col,
                                  hot_chunks=hot, id_type=id_type)
