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


def exact_dedup(ds, text_col: str = "text", id_col: str = "url", algo: str = "md5",
                num_partitions: int = 16):
    """Keep one row per distinct text (min id wins).  Shuffle key: digest.

    A per-BATCH pre-dedup (the min-id row per digest survives locally)
    runs before the shuffle: global-min-id selection is a combinable
    aggregate, so a hot digest (a page mirrored 10⁶×) ships one row per
    batch instead of every copy into a single reducer partition.
    """
    from dedup_ray.util.dsutil import partitioned_group_apply

    with_digest = add_digest(ds, text_col=text_col, id_col=id_col, algo=algo)

    def keep_first(part: pd.DataFrame) -> pd.DataFrame:
        return part.sort_values(id_col).drop_duplicates(subset=["digest"])

    precombined = with_digest.map_batches(
        keep_first, batch_format="pandas"
    )
    return partitioned_group_apply(
        precombined, ["digest"], keep_first, num_partitions
    )


def exact_rep_partition(ds_with_digest, id_col: str = "url",
                        num_partitions: int = 16,
                        return_refs: bool = False):
    """ONE digest shuffle → mixed table of representatives + star edges.

    Output rows are either a REPRESENTATIVE (the min-id member of a digest
    group, carrying every input column, ``id1``/``id2`` null) or a star
    EDGE ``(id1=rep, id2=member)`` with the payload columns null.  Callers
    filter on ``id1``'s validity to split the two.

    Running the near-dup path on representatives instead of the raw corpus
    is load-bearing at scale: a group of k byte-identical documents has k
    IDENTICAL MinHash signatures, so raw-corpus banding emits
    O(k² · bands) candidate rows per group — exactly the blow-up observed
    at high duplication factors — while reps cost O(k) star edges here and
    one row downstream.
    """
    import numpy as np

    from dedup_ray.util.exchange import exchange_group_apply

    def split(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            # small shards leave exchange partitions empty; the numpy scan
            # below would type-infer float64 from [] and break the id cast
            if id_col not in part.column_names:
                return part  # void block — contributes nothing
            idt = part.schema.field(id_col).type
            cols = {}
            for c in part.column_names:
                t = part.schema.field(c).type
                if pa.types.is_fixed_size_binary(t):
                    t = pa.binary()
                cols[c] = pa.array([], t)
            cols["id1"] = pa.array([], idt)
            cols["id2"] = pa.array([], idt)
            return pa.table(cols)
        # wide payloads (sig/chunks) stay Arrow; only the two narrow key
        # columns are gathered to numpy for the group scan
        d = np.asarray(part["digest"].to_pylist())
        ids = np.asarray(part[id_col].to_pylist())
        order = np.lexsort((ids, d))
        d_s, ids_s = d[order], ids[order]
        change = np.r_[True, d_s[1:] != d_s[:-1]] if len(d_s) else np.zeros(0, bool)
        reps = part.take(pa.array(order[np.flatnonzero(change)]))
        # fixed-width binary → variable width: the edge rows carry NULL
        # payloads, and variable-width nulls cost zero bytes through every
        # downstream filter/take (fixed-width nulls materialize full cells)
        cols = {}
        for c in reps.column_names:
            arr = reps[c].combine_chunks()
            if pa.types.is_fixed_size_binary(arr.type):
                arr = arr.cast(pa.binary())
            cols[c] = arr
        n_reps = reps.num_rows
        # edge id columns carry the id column's native type (url corpora
        # are string-keyed, documents tables int64-keyed — both must work)
        id_type = part.schema.field(id_col).type
        cols["id1"] = pa.nulls(n_reps, id_type)
        cols["id2"] = pa.nulls(n_reps, id_type)
        reps_t = pa.table(cols)
        starts = np.flatnonzero(change)
        sizes = np.diff(np.r_[starts, len(d_s)])
        e1 = np.repeat(ids_s[starts], sizes - 1)
        e2 = ids_s[~change]
        edge_cols = {}
        for c in reps_t.column_names:
            if c == "id1":
                edge_cols[c] = pa.array(e1, id_type)
            elif c == "id2":
                edge_cols[c] = pa.array(e2, id_type)
            else:
                edge_cols[c] = pa.nulls(len(e2), reps_t[c].type)
        return pa.concat_tables([reps_t, pa.table(edge_cols)])

    return exchange_group_apply(
        ds_with_digest, "digest", split, num_partitions,
        return_refs=return_refs,
    )


def exact_dup_edges(ds_with_digest, id_col: str = "url", num_partitions: int = 16):
    """Digest groups → star edges (min_id, other_id) for the component stage.

    A group of n identical texts contributes n-1 edges to the duplicate
    graph — the sparse (star) encoding of a clique, same trick as the
    reference's chain-graph glue (``uni_glue_baseline.R:54-56``, SURVEY.md G5).
    """
    from dedup_ray.util.dsutil import partitioned_group_apply

    import numpy as np

    def stars(part: pd.DataFrame) -> pd.DataFrame:
        # vectorized star emission: sort by (digest, id), detect group
        # boundaries, repeat each group's min id against its other members
        d = part["digest"].to_numpy()
        ids = part[id_col].to_numpy()
        order = np.lexsort((ids, d))
        d_s, ids_s = d[order], ids[order]
        change = np.r_[True, d_s[1:] != d_s[:-1]]
        starts = np.flatnonzero(change)
        sizes = np.diff(np.r_[starts, len(d_s)])
        id1 = np.repeat(ids_s[starts], sizes - 1)
        id2 = ids_s[~change]
        return pd.DataFrame({"id1": id1, "id2": id2}).astype(
            {"id1": object, "id2": object}
        )

    return partitioned_group_apply(
        ds_with_digest.select_columns(["digest", id_col]), ["digest"], stars,
        num_partitions,
    )
