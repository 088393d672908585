"""LSH banding and candidate-pair generation.

The distributed replacement for the reference's block key: where the
reference shards the corpus by ambiguous author name and enumerates all
C(n,2) pairs inside a block (``Makefile:59-99`` + ``c_org.py:30-31``,
SURVEY.md P1), here the block key is the LSH band bucket
``(band_idx, hash(sig[band]))`` and the pair space is the union over bands,
deduplicated on ``(id1, id2)``.

Skew policy (SURVEY.md §4): a boilerplate shingle can put millions of docs
into one bucket ⇒ O(n²) pairs.  Buckets larger than ``max_band_group`` emit
a sparse star+sliding-window pattern over the sorted member ids instead of
all pairs — O(n) edges that keep a true duplicate clique connected (every
member still reaches the minimum id) while bounding cost; spurious members
are cut later by per-pair verification.  Capped buckets are counted in a
``capped`` marker column so truncation is observable, never silent.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from dedup_ray.config import DedupConfig
from dedup_ray.stages.minhash import unpack_signatures
from dedup_ray.util.hashing import combine_rows


class BandExploder:
    """(id, sig) batch → (id, band, bhash) rows; n_docs × bands output rows."""

    def __init__(self, config: DedupConfig | None = None, id_col: str = "url") -> None:
        self.cfg = config or DedupConfig()
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = batch.num_rows
        sigs = unpack_signatures(batch["sig"], cfg.num_perms)
        sigs = sigs.reshape(n, cfg.bands, cfg.rows_per_band)
        parts = []
        for b in range(cfg.bands):
            bh = combine_rows(sigs[:, b, :], salt=b + 1)
            parts.append(
                pa.table(
                    {
                        self.id_col: batch[self.id_col],
                        "band": pa.array(np.full(n, b, dtype=np.int32)),
                        # int64 view: uint64 keys overflow when groups round-
                        # trip through pandas inside groupby/map_groups
                        "bhash": pa.array(bh.view(np.int64)),
                    }
                )
            )
        return pa.concat_tables(parts)


def band_explode(sigs_ds, config: DedupConfig | None = None, id_col: str = "url"):
    """Stateless task-pool stage (no actor startup cost — state is only cfg)."""
    cfg = config or DedupConfig()
    exploder = BandExploder(cfg, id_col=id_col)
    # prune to the two columns this stage reads — compact may carry wide
    # payload columns (chunk blobs) that the band shuffle must not drag
    return sigs_ds.select_columns([id_col, "sig"]).map_batches(
        exploder, batch_format="pyarrow", batch_size=cfg.batch_size
    )


def emit_bucket_pairs(
    part: pd.DataFrame,
    key_cols: list,
    id_col: str,
    cap: int,
    window: int,
    max_df: int | None = None,
    value_cols: tuple = (),
) -> tuple[pd.DataFrame, np.ndarray]:
    """All-pairs within each key group of one partition, fully vectorized.

    Replaces a per-group pandas ``groupby`` loop (30-50µs of dispatch per
    bucket — ruinous with tens of thousands of buckets per partition) with
    numpy: one lexsort, boundary detection, then pair emission batched by
    GROUP-SIZE CLASS — every group of size s shares one ``triu_indices(s)``
    gather, so Python cost is O(#distinct sizes), not O(#groups).

    Groups larger than ``cap`` fall back to the sparse star+window pattern
    (hot-band skew policy); with ``max_df`` set, groups above it are
    *dropped* entirely and their keys returned as the census of hot keys
    (substring boilerplate semantics).  Returns ``(pairs_df(id1, id2,
    capped[, <v>_1, <v>_2…]), hot_keys)`` with one hot-key array per key
    column.  ``value_cols`` are per-row payloads gathered onto both pair
    sides — this lets a narrow payload (e.g. an 8-byte SimHash fingerprint)
    ride the band shuffle so verification runs inline on the emitted pairs
    instead of re-joining a corpus-sized side table per pair endpoint.
    """
    cols = [part[c].to_numpy() for c in key_cols]
    ids = part[id_col].to_numpy()
    order = np.lexsort((ids, *cols[::-1]))
    ids_s = ids[order]
    cols_s = [c[order] for c in cols]
    vals_s = [part[c].to_numpy()[order] for c in value_cols]

    def _empty() -> pd.DataFrame:
        cols_out = {"id1": pd.Series(dtype=object), "id2": pd.Series(dtype=object),
                    "capped": pd.Series(dtype=bool)}
        for c in value_cols:
            cols_out[f"{c}_1"] = pd.Series(dtype=part[c].dtype)
            cols_out[f"{c}_2"] = pd.Series(dtype=part[c].dtype)
        return pd.DataFrame(cols_out)

    n = len(ids_s)
    if n == 0:
        return _empty(), [np.array([]) for _ in key_cols]
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for c in cols_s:
        change[1:] |= c[1:] != c[:-1]
    # drop duplicate (group, id) rows so group size == distinct doc count
    dup = ~change.copy()
    dup[1:] &= ids_s[1:] == ids_s[:-1]
    if dup.any():
        keep = ~dup
        ids_s = ids_s[keep]
        cols_s = [c[keep] for c in cols_s]
        vals_s = [v[keep] for v in vals_s]
        change = change[keep]
        n = len(ids_s)
    starts = np.flatnonzero(change)
    ends = np.r_[starts[1:], n]
    sizes = ends - starts

    hot_keys = [c[:0] for c in cols_s]
    if max_df is not None:
        hot_mask = sizes > max_df
        hot_keys = [c[starts[hot_mask]] for c in cols_s]
        starts, ends, sizes = starts[~hot_mask], ends[~hot_mask], sizes[~hot_mask]

    out1: list = []
    out2: list = []
    capped: list = []
    outv1: list = [[] for _ in value_cols]
    outv2: list = [[] for _ in value_cols]
    for s in np.unique(sizes):
        if s < 2:
            continue
        sel = np.flatnonzero(sizes == s)
        if s <= cap:
            idx = starts[sel][:, None] + np.arange(s)[None, :]
            mat = ids_s[idx]  # (k, s); rows sorted by id via the lexsort
            i1, i2 = np.triu_indices(s, 1)
            out1.append(mat[:, i1].ravel())
            out2.append(mat[:, i2].ravel())
            capped.append(np.zeros(len(sel) * len(i1), dtype=bool))
            for vi, v in enumerate(vals_s):
                vmat = v[idx]
                outv1[vi].append(vmat[:, i1].ravel())
                outv2[vi].append(vmat[:, i2].ravel())
        else:
            for st in starts[sel]:  # hot groups are rare by construction
                i1, i2 = _pair_index(s, cap, window)
                out1.append(ids_s[st + i1])
                out2.append(ids_s[st + i2])
                capped.append(np.ones(len(i1), dtype=bool))
                for vi, v in enumerate(vals_s):
                    outv1[vi].append(v[st + i1])
                    outv2[vi].append(v[st + i2])
    if not out1:
        return _empty(), hot_keys
    data = {
        "id1": np.concatenate(out1),
        "id2": np.concatenate(out2),
        "capped": np.concatenate(capped),
    }
    for vi, c in enumerate(value_cols):
        data[f"{c}_1"] = np.concatenate(outv1[vi])
        data[f"{c}_2"] = np.concatenate(outv2[vi])
    return pd.DataFrame(data), hot_keys


def _pair_index(n: int, cap: int, window: int) -> tuple[np.ndarray, np.ndarray]:
    """Pair index arrays (i1 < i2) into a SORTED group of size n.

    Full triangle when n <= cap; else the sparse star+window pattern —
    star to index 0 plus a sliding window — O(n·window) edges that keep a
    true duplicate clique connected while bounding hot-bucket cost.
    """
    if n <= cap:
        return np.triu_indices(n, 1)
    idx = np.arange(n)
    parts1 = [np.zeros(n - 1, dtype=np.int64)]
    parts2 = [idx[1:]]
    for w in range(1, window + 1):
        parts1.append(idx[1 : n - w])
        parts2.append(idx[1 + w : n])
    return np.concatenate(parts1), np.concatenate(parts2)


def triangle_pairs_grouped(
    group_key: np.ndarray, cap: int | None = None,
    skip_over: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Absolute index arrays (i1, i2) for the full pair triangle within
    each run of equal consecutive ``group_key`` values.

    Callers pre-sort their rows by (group, id) so each run's first
    ``min(run_len, cap)`` elements are its smallest ids; pairs index
    into the SORTED arrays.  ``cap`` TRUNCATES an oversized run to its
    smallest ids; ``skip_over`` DROPS runs larger than it entirely (the
    minimizer / FastSS observable-undercount policy).  The shared core
    of the super-shingle bucket explode
    (``stages/minhash.supershingle_pairs``), the minimizer and FastSS
    explodes, and the blocking-quality candidate explode
    (``pipelines/queries``) — the LSH bucket path keeps its star+window
    variant via :func:`_pair_index` with a real cap.
    """
    e = np.array([], np.int64)
    if len(group_key) == 0:
        return e, e
    n = len(group_key)
    starts = np.flatnonzero(np.r_[True, group_key[1:] != group_key[:-1]])
    lens = np.diff(np.r_[starts, n])
    eff = lens if cap is None else np.minimum(lens, cap)
    if skip_over is not None:
        eff = np.where(lens > skip_over, 0, eff)
    # fully vectorized triangle: row at local offset a within a run of
    # effective size m pairs with the m-1-a rows that follow it
    local = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
    cnt = np.repeat(eff.astype(np.int64), lens) - 1 - local
    np.clip(cnt, 0, None, out=cnt)
    total = int(cnt.sum())
    if total == 0:
        return e, e
    i1 = np.repeat(np.arange(n, dtype=np.int64), cnt)
    off = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(cnt) - cnt, cnt)
    return i1, i1 + off + 1


def _emit_pairs(ids, cap: int, window: int) -> tuple[np.ndarray, np.ndarray, bool]:
    """Pairs for one bucket, vectorized.  Returns (id1s, id2s, capped)."""
    ids = np.sort(np.asarray(ids))
    n = len(ids)
    i1, i2 = _pair_index(n, cap, window)
    return ids[i1], ids[i2], n > cap


def candidate_pairs(
    bands_ds,
    config: DedupConfig | None = None,
    id_col: str = "url",
    global_dedup: bool = True,
    id_type: pa.DataType | None = None,
    return_refs: bool = False,
):
    """Band buckets → candidate (id1, id2) pairs (id1 < id2).

    One mandatory shuffle: hash-partition on (band, bhash) for bucket
    formation — the "band groupby → distinct" plan from SURVEY.md §7.1,
    executed via ``partitioned_group_apply`` (one vectorized task per
    partition, not one Python call per bucket).

    ``global_dedup=True`` adds a second shuffle on (id1, id2) producing an
    exactly-distinct pair set.  Pass ``False`` when the downstream consumer
    is itself a co-partitioning join that can dedup for free — which is what
    the end-to-end pipeline does (``dedup.py::_near``): the first verify
    ``hash_join`` co-partitions every (id1, *) row by hash(id1), so its
    ``left_prep`` drop_duplicates IS a global pair dedup, saving one
    all-to-all round.  Cross-band duplicate pairs then inflate only the
    narrow ~80B/row pair stream between the band shuffle and that join,
    never the 1KB/row signature joins.
    """
    from dedup_ray.util.dsutil import partitioned_group_apply
    from dedup_ray.util.exchange import exchange_group_apply

    cfg = config or DedupConfig()

    def buckets_to_pairs_arrow(part: pa.Table) -> pa.Table:
        id_type = part.schema.field(id_col).type  # string OR int64 corpora
        df = part.select([id_col, "band", "bhash"]).to_pandas()
        pairs, _ = emit_bucket_pairs(
            df, ["band", "bhash"], id_col, cfg.max_band_group, cfg.hot_window
        )
        # batch-local pair dedup rides along (cross-band dups are removed
        # globally by the verify exchange's left_prep)
        pairs = pairs.drop_duplicates(subset=["id1", "id2"])
        return pa.table(
            {
                "id1": pa.array(pairs["id1"], id_type),
                "id2": pa.array(pairs["id2"], id_type),
                "capped": pa.array(pairs["capped"], pa.bool_()),
            }
        )

    # empty_schema covers the entirely-empty-corpus case (every page
    # filtered upstream → all exchange blocks void); the caller supplies
    # the corpus id dtype since a void block carries none
    pairs = exchange_group_apply(
        bands_ds,
        ["band", "bhash"],
        buckets_to_pairs_arrow,
        cfg.num_partitions,
        # chained consumers (the verify join) take the raw refs — one
        # fewer plan-execution barrier per hop
        return_refs=return_refs and not global_dedup,
        empty_schema=pa.schema(
            [
                (id_col, id_type or pa.string()),
                ("band", pa.int32()),
                ("bhash", pa.int64()),
            ]
        ),
    )
    if not global_dedup:
        return pairs

    def dedup(part: pd.DataFrame) -> pd.DataFrame:
        return part.drop_duplicates(subset=["id1", "id2"])

    return partitioned_group_apply(pairs, ["id1", "id2"], dedup, cfg.num_partitions)
