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


def candidate_pairs(bands_ds, config: DedupConfig | None = None, id_col: str = "url"):
    """Band buckets → distinct candidate (id1, id2) pairs (id1 < id2).

    Two shuffles: groupby (band, bhash) for bucket formation, then groupby
    (id1, id2) for cross-band dedup — exactly the "band groupby → distinct"
    plan from SURVEY.md §7.1.
    """
    cfg = config or DedupConfig()

    def bucket_to_pairs(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"id1": [], "id2": [], "capped": []})
        id1s, id2s, capped = _emit_pairs(
            group[id_col].tolist(), cfg.max_band_group, cfg.hot_window
        )
        return pd.DataFrame({"id1": id1s, "id2": id2s, "capped": capped})

    pairs = bands_ds.groupby(["band", "bhash"]).map_groups(
        bucket_to_pairs, batch_format="pandas"
    )

    def dedup_pair(group: pd.DataFrame) -> pd.DataFrame:
        return group.head(1)

    from dedup_ray.util.dsutil import as_arrow

    return as_arrow(
        pairs.groupby(["id1", "id2"]).map_groups(dedup_pair, batch_format="pandas")
    )
