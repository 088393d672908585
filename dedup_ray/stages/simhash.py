"""SimHash fingerprints for fuzzy near-dup matching (second candidate path).

64-bit SimHash over the same k-shingle hashes as MinHash (Charikar'02 /
Manku et al. WWW'07): each shingle votes ±1 on every bit; the sign of the
vote sum is the fingerprint bit.  Candidate generation uses the pigeonhole
banding from Manku: split the fingerprint into ``simhash_bands`` equal bit
bands — any two fingerprints within hamming distance ``bands - 1`` share at
least one exact band, so grouping by (band, band_bits) finds all pairs with
hamming ≤ simhash_max_hamming when ``simhash_max_hamming < bands``.

Scale shape (mirrors the MinHash path in ``lsh.py``): ONE hash-partition
shuffle on (sband, sbits) with vectorized pair emission per partition
(``emit_bucket_pairs`` — no per-bucket Python dispatch), the 8-byte
fingerprint riding the band rows as a value column so exact-hamming
verification (vectorized popcount) runs INLINE on the emitted pairs — no
fingerprint join against a corpus-sized side table — then one narrow
(id1, id2) dedup shuffle over the *verified* pairs only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from dedup_ray.config import DedupConfig


def simhash_from_shingles(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Packed shingle hashes (uint64) + per-doc offsets → per-doc fingerprints.

    64 bit-plane passes (one uint64 shift+mask + reduceat each) instead of
    materializing an (n_shingles, 64) matrix — the matrix version touched
    ~256 B/shingle of fresh memory and was the single hottest kernel in the
    signer (12× slower than MinHash itself).  votes = 2·ones − n.
    """
    n_docs = len(offsets) - 1
    if len(values) == 0:
        return np.zeros(n_docs, dtype=np.int64)
    seg = offsets[:-1]
    n_per_doc = np.diff(offsets).astype(np.int64)
    fp = np.zeros(n_docs, dtype=np.uint64)
    for bit in range(64):
        ones = np.add.reduceat(
            ((values >> np.uint64(bit)) & np.uint64(1)).astype(np.int64), seg
        )
        fp |= ((2 * ones - n_per_doc) > 0).astype(np.uint64) << np.uint64(bit)
    # int64 view: signed is the engine-wide 64-bit column type (pandas-safe)
    return fp.view(np.int64)


def hamming(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount of XOR (any 64-bit dtype)."""
    x = a.astype(np.int64, copy=False) ^ b.astype(np.int64, copy=False)
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)


def _band_explode_fn(config: DedupConfig, id_col: str = "url"):
    """Per-batch Arrow fn of :func:`simhash_band_explode` (exposed so the
    chained-ref path can run it via ``map_refs``)."""
    cfg = config
    width = cfg.simhash_bits // cfg.simhash_bands
    mask = np.uint64((1 << width) - 1)

    def f(batch: pa.Table) -> pa.Table:
        fp = (
            batch["simhash"]
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
            .view(np.uint64)
        )
        n = len(fp)
        parts = []
        for b in range(cfg.simhash_bands):
            bits = (fp >> np.uint64(b * width)) & mask
            parts.append(
                pa.table(
                    {
                        id_col: batch[id_col],
                        "sband": pa.array(np.full(n, b, dtype=np.int32)),
                        "sbits": pa.array(bits.view(np.int64)),
                        "fp": pa.array(fp.view(np.int64)),
                    }
                )
            )
        return pa.concat_tables(parts)

    return f


def simhash_band_explode(compact_ds, config: DedupConfig, id_col: str = "url"):
    """(id, simhash) → (id, sband, sbits, fp) rows; fp = the full fingerprint.

    Carrying the 8-byte fingerprint on every band row costs
    ``simhash_bands × 8`` bytes/doc in the shuffle and buys inline hamming
    verification — strictly cheaper than two corpus-sized joins after.
    """
    cfg = config
    return compact_ds.select_columns([id_col, "simhash"]).map_batches(
        _band_explode_fn(cfg, id_col), batch_format="pyarrow",
        batch_size=cfg.batch_size,
    )


def simhash_edges(compact_ds, config: DedupConfig, id_col: str = "url",
                  id_type=None, return_refs: bool = False):
    """Full SimHash path: band explode → inline hamming-verified edges.

    Shuffles: (sband, sbits) bucket formation, then a narrow (id1, id2)
    dedup over verified pairs only — the two hops ref-chained (no plan
    execution between them).  ``compact_ds`` may be a Dataset or a
    block-ref list (chained from the exact partition); output is a
    Dataset(id1, id2, hamming), or its raw refs with ``return_refs``.
    """
    from dedup_ray.stages.lsh import emit_bucket_pairs

    cfg = config
    if isinstance(compact_ds, list):
        from dedup_ray.util.exchange import map_refs

        explode = _band_explode_fn(cfg, id_col)

        def explode_block(t: pa.Table) -> pa.Table:
            if "simhash" not in t.column_names:  # void block
                return t
            return explode(t.select([id_col, "simhash"]))

        rows = map_refs(compact_ds, explode_block)
    else:
        rows = simhash_band_explode(compact_ds, cfg, id_col)

    def buckets_to_edges(part: pd.DataFrame) -> pd.DataFrame:
        pairs, _ = emit_bucket_pairs(
            part, ["sband", "sbits"], id_col, cfg.max_band_group, cfg.hot_window,
            value_cols=("fp",),
        )
        if len(pairs) == 0:
            return pd.DataFrame(
                {"id1": pd.Series(dtype=object), "id2": pd.Series(dtype=object),
                 "hamming": pd.Series(dtype="int64")}
            )
        d = hamming(pairs["fp_1"].to_numpy(), pairs["fp_2"].to_numpy())
        keep = d <= cfg.simhash_max_hamming
        return pd.DataFrame(
            {
                "id1": pairs["id1"].to_numpy()[keep],
                "id2": pairs["id2"].to_numpy()[keep],
                "hamming": d[keep].astype(np.int64),
            }
        )

    from dedup_ray.util.exchange import exchange_group_apply

    def buckets_to_edges_arrow(part: pa.Table) -> pa.Table:
        id_type = part.schema.field(id_col).type  # string OR int64 corpora
        out = buckets_to_edges(part.to_pandas())
        return pa.table(
            {
                "id1": pa.array(out["id1"], id_type),
                "id2": pa.array(out["id2"], id_type),
                "hamming": pa.array(out["hamming"], pa.int64()),
            }
        )

    edges = exchange_group_apply(
        rows,
        ["sband", "sbits"],
        buckets_to_edges_arrow,
        cfg.num_partitions,
        return_refs=True,  # chained into the pair-dedup exchange
        # entirely-empty corpus → all blocks void; caller supplies id dtype
        empty_schema=pa.schema(
            [
                (id_col, id_type or pa.string()),
                ("sband", pa.int32()),
                ("sbits", pa.int64()),
                ("fp", pa.int64()),
            ]
        ),
    )

    def dedup_arrow(part: pa.Table) -> pa.Table:
        df = part.to_pandas().drop_duplicates(subset=["id1", "id2"])
        return pa.Table.from_pandas(df, preserve_index=False)

    return exchange_group_apply(
        edges, ["id1", "id2"], dedup_arrow, cfg.num_partitions,
        return_refs=return_refs,
    )


def simhash_md5_docs(ds, id_col: str = "doc_id", text_col: str = "text"):
    """SimHash fingerprints over md5 token-hash bit planes — the
    ORACLE-SIDE spec twin of the signer's keyed SimHash.

    Standard SimHash: every token OCCURRENCE contributes +1/-1 per bit of
    its 64-bit hash; fingerprint bit b = 1 iff the per-doc sum >= 0 (the
    tie goes to 1).  Here the token hash is the first 16 hex chars of
    ``md5(token)``, so the DuckDB oracle can replay every bit: explode
    tokens x 64 bit positions, decode the covering hex digit, sum the
    signs, repack the majority bits into a 16-hex fingerprint.  Output:
    ``(id_col, simhex)`` with the fingerprint as a fixed-width hex string
    (compares exactly as the uint64 it encodes).  A document with no
    tokens has all-zero sums, hence all-ones fingerprint.
    """
    from dedup_ray.stages.textstats import explode_tokens
    from dedup_ray.util.hashing import content_digest

    def f(t: pa.Table) -> pa.Table:
        flat, parent, _ = explode_tokens(t[text_col], t.num_rows)
        n = t.num_rows
        sums = np.zeros((n, 64), np.int64)
        toks = flat.to_pylist()
        if toks:
            u, inv = np.unique(np.asarray(toks, object),
                               return_inverse=True)
            hu = np.array(
                [int(d[:16], 16) for d in content_digest(list(u),
                                                         algo="md5")],
                dtype=np.uint64)
            h = hu[inv]
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64))
                    & np.uint64(1)).astype(np.int64)
            np.add.at(sums, parent, 2 * bits - 1)
        fp = (sums >= 0).astype(np.uint64)
        vals = (fp << np.arange(64, dtype=np.uint64)).sum(axis=1,
                                                          dtype=np.uint64)
        hexes = [format(int(v), "016x") for v in vals]
        return pa.table({id_col: t[id_col],
                         "simhex": pa.array(hexes, pa.string())})

    return ds.map_batches(f, batch_format="pyarrow")
