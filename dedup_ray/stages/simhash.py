"""SimHash fingerprints for fuzzy near-dup matching (second candidate path).

64-bit SimHash over the same k-shingle hashes as MinHash (Charikar'02 /
Manku et al. WWW'07): each shingle votes ±1 on every bit; the sign of the
vote sum is the fingerprint bit.  Candidate generation uses the pigeonhole
banding from Manku: split the fingerprint into ``simhash_bands`` equal bit
bands — any two fingerprints within hamming distance ``bands - 1`` share at
least one exact band, so grouping by (band, band_bits) finds all pairs with
hamming ≤ simhash_max_hamming when ``simhash_max_hamming < bands``.
Verification computes the exact hamming distance from the joined
fingerprints (vectorized popcount).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from dedup_ray.config import DedupConfig


def simhash_from_shingles(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Packed shingle hashes (uint64) + per-doc offsets → per-doc fingerprints."""
    n_docs = len(offsets) - 1
    if len(values) == 0:
        return np.zeros(n_docs, dtype=np.uint64)
    bits = ((values[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
        np.int32
    )  # (n_shingles, 64) in {0,1}
    votes = np.add.reduceat(bits * 2 - 1, offsets[:-1], axis=0)  # (n_docs, 64)
    fp_bits = (votes > 0).astype(np.uint64)
    fp = (fp_bits << np.arange(64, dtype=np.uint64)).sum(axis=1, dtype=np.uint64)
    # int64 view: signed is the engine-wide 64-bit column type (pandas-safe)
    return fp.view(np.int64)


def hamming(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount of XOR (any 64-bit dtype)."""
    x = a.astype(np.int64, copy=False) ^ b.astype(np.int64, copy=False)
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)


def simhash_band_explode(compact_ds, config: DedupConfig, id_col: str = "url"):
    """(id, simhash) → (id, sband, sbits) rows; bands of 64/simhash_bands bits."""
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
                    }
                )
            )
        return pa.concat_tables(parts)

    return compact_ds.map_batches(f, batch_format="pyarrow",
                                  batch_size=cfg.batch_size)


def simhash_candidates(band_rows, config: DedupConfig, id_col: str = "url"):
    from dedup_ray.stages.lsh import _emit_pairs
    from dedup_ray.util.dsutil import as_arrow

    cfg = config

    def bucket_to_pairs(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"id1": [], "id2": []})
        id1s, id2s, _ = _emit_pairs(
            group[id_col].tolist(), cfg.max_band_group, cfg.hot_window
        )
        return pd.DataFrame({"id1": id1s, "id2": id2s})

    pairs = band_rows.groupby(["sband", "sbits"]).map_groups(
        bucket_to_pairs, batch_format="pandas"
    )

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return as_arrow(
        pairs.groupby(["id1", "id2"]).map_groups(first, batch_format="pandas")
    )


def verify_simhash_pairs(pairs_ds, compact_ds, config: DedupConfig,
                         id_col: str = "url"):
    """Exact hamming ≤ simhash_max_hamming via fingerprint joins."""
    from dedup_ray.stages.verify import _rename, empty_edges

    cfg = config
    pairs_ds = pairs_ds.materialize()
    if pairs_ds.count() == 0:
        return empty_edges({"hamming": pa.int64()})
    side = compact_ds.select_columns([id_col, "simhash"])
    s1 = _rename(side, {id_col: "id1", "simhash": "fp1"})
    s2 = _rename(side, {id_col: "id2", "simhash": "fp2"})
    joined = pairs_ds.select_columns(["id1", "id2"]).join(
        s1, join_type="inner", num_partitions=cfg.num_partitions, on=("id1",)
    ).join(s2, join_type="inner", num_partitions=cfg.num_partitions, on=("id2",))

    def keep(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"id1": pa.array([], pa.string()), "id2": pa.array([], pa.string()),
                 "hamming": pa.array([], pa.int64())}
            )
        f1 = batch["fp1"].to_numpy(zero_copy_only=False).astype(np.int64)
        f2 = batch["fp2"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = hamming(f1, f2)
        keepm = d <= cfg.simhash_max_hamming
        return pa.table(
            {
                "id1": batch["id1"].filter(pa.array(keepm)),
                "id2": batch["id2"].filter(pa.array(keepm)),
                "hamming": pa.array(d[keepm].astype(np.int64)),
            }
        )

    return joined.map_batches(keep, batch_format="pyarrow")


def simhash_edges(compact_ds, config: DedupConfig, id_col: str = "url"):
    """Full SimHash path: band explode → candidates → hamming-verified edges."""
    rows = simhash_band_explode(compact_ds, config, id_col)
    cands = simhash_candidates(rows, config, id_col)
    return verify_simhash_pairs(cands, compact_ds, config, id_col)
