"""Exact (content-digest) deduplication.

Reference semantics: exact-key grouping *is* dedup in the reference —
``venue_bag.py:11-15`` / ``org_bag.py:14-21`` cluster by exact key, and
``drop_duplicates`` (``doc2vec.py:66``, SURVEY.md D1/A4) is the distinct
primitive.  Here the key is a content digest of the text, the grouping is a
Ray Data hash shuffle, and the "first" row per group is the deterministic
minimum id — independent of partitioning and parallelism.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from dedup_ray.util.hashing import content_digest


def add_digest(ds, text_col: str = "text", id_col: str = "url", algo: str = "md5"):
    """Append a hex content-digest column (vectorized-at-batch map)."""

    def _digest(batch: pa.Table) -> pa.Table:
        d = content_digest(batch[text_col].to_pylist(), algo=algo)
        return batch.append_column("digest", pa.array(d, pa.string()))

    return ds.map_batches(_digest, batch_format="pyarrow")


def exact_dedup(ds, text_col: str = "text", id_col: str = "url", algo: str = "md5"):
    """Keep one row per distinct text (min id wins).  Shuffle key: digest."""
    with_digest = add_digest(ds, text_col=text_col, id_col=id_col, algo=algo)

    def keep_first(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(id_col).head(1)

    return with_digest.groupby("digest").map_groups(keep_first, batch_format="pandas")


def exact_dup_edges(ds_with_digest, id_col: str = "url"):
    """Digest groups → star edges (min_id, other_id) for the component stage.

    A group of n identical texts contributes n-1 edges to the duplicate
    graph — the sparse (star) encoding of a clique, same trick as the
    reference's chain-graph glue (``uni_glue_baseline.R:54-56``, SURVEY.md G5).
    """

    def star(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"id1": [], "id2": []}).astype({"id1": str, "id2": str})
        ids = sorted(group[id_col].tolist())
        return pd.DataFrame({"id1": [ids[0]] * (len(ids) - 1), "id2": ids[1:]})

    from dedup_ray.util.dsutil import as_arrow

    return as_arrow(
        ds_with_digest.groupby("digest").map_groups(star, batch_format="pandas")
    )
