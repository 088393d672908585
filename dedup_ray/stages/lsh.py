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
    return sigs_ds.map_batches(
        exploder, batch_format="pyarrow", batch_size=cfg.batch_size
    )


def _emit_pairs(ids: list, cap: int, window: int) -> tuple[list, list, bool]:
    """Pairs for one bucket.  Returns (id1s, id2s, capped)."""
    n = len(ids)
    ids = sorted(ids)
    if n <= cap:
        i1, i2 = np.triu_indices(n, 1)
        return [ids[i] for i in i1], [ids[j] for j in i2], False
    # hot bucket: star to min + sliding window — O(n·window) edges
    id1s = [ids[0]] * (n - 1)
    id2s = ids[1:]
    for w in range(1, window + 1):
        for i in range(1, n - w):
            id1s.append(ids[i])
            id2s.append(ids[i + w])
    return id1s, id2s, True


def candidate_pairs(
    bands_ds,
    config: DedupConfig | None = None,
    id_col: str = "url",
    global_dedup: bool = True,
):
    """Band buckets → candidate (id1, id2) pairs (id1 < id2).

    One mandatory shuffle: hash-partition on (band, bhash) for bucket
    formation — the "band groupby → distinct" plan from SURVEY.md §7.1,
    executed via ``partitioned_group_apply`` (one vectorized task per
    partition, not one Python call per bucket).

    ``global_dedup=True`` adds a second shuffle on (id1, id2) producing an
    exactly-distinct pair set.  The end-to-end pipeline passes ``False``:
    cross-band duplicate pairs (bounded by ``bands`` per pair, typically
    1-3 in practice) are removed per-batch only, cost a little duplicate
    verification, and are harmless to union-find CC — cheaper at scale than
    an extra all-to-all exchange over the full candidate set.
    """
    from dedup_ray.util.dsutil import partitioned_group_apply

    cfg = config or DedupConfig()

    def buckets_to_pairs(part: pd.DataFrame) -> pd.DataFrame:
        out1: list = []
        out2: list = []
        capped_any = []
        for _, sub in part.groupby(["band", "bhash"], sort=False):
            if len(sub) < 2:
                continue
            id1s, id2s, capped = _emit_pairs(
                sub[id_col].tolist(), cfg.max_band_group, cfg.hot_window
            )
            out1.extend(id1s)
            out2.extend(id2s)
            capped_any.extend([capped] * len(id1s))
        return pd.DataFrame({"id1": out1, "id2": out2, "capped": capped_any})

    pairs = partitioned_group_apply(
        bands_ds, ["band", "bhash"], buckets_to_pairs, cfg.num_partitions
    )

    def dedup(part: pd.DataFrame) -> pd.DataFrame:
        return part.drop_duplicates(subset=["id1", "id2"])

    if not global_dedup:
        return pairs.map_batches(dedup, batch_format="pandas")
    return partitioned_group_apply(pairs, ["id1", "id2"], dedup, cfg.num_partitions)
