"""Deterministic global shuffle: a reproducible pseudo-random total order
over the corpus (the training-order shuffle of an LLM data pipeline).

A real 100-TB corpus cannot be shuffled by ``random_shuffle`` + collect —
and training runs need the ORDER to be reproducible across retries and
resumable mid-epoch.  The standard trick: order by a keyed hash of the
document id.  ``shuffle_rank`` assigns each doc its global position in
``md5(id:seed)`` order with the same two-level scan the sequence packer
uses (``stages/packing.py``): the first key byte forms 256 ordered coarse
buckets, bucket counts stream to the driver (256 rows), a cumsum gives
each bucket's global offset, and one exchange sorts within buckets.

md5 (not the engine's keyed BLAKE2b) is deliberate: the order is part of
the public spec — any engine, including the DuckDB oracle, can recompute
it from the id and seed alone.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from dedup_ray.util.hashing import content_digest


def _hex2_to_int(dg: list[str]) -> np.ndarray:
    """First hex byte of each digest → int, vectorized (no per-row int())."""
    u2 = np.array(dg, dtype="U2")  # truncates to first two chars
    codes = u2.view(np.uint32).reshape(len(dg), 2).astype(np.int64)
    vals = codes - 48 - 39 * (codes >= 97)  # '0'-'9' → 0-9, 'a'-'f' → 10-15
    return vals[:, 0] * 16 + vals[:, 1]


def shuffle_rank(ds, id_col: str = "doc_id", seed: int = 42,
                 num_partitions: int = 16):
    """Assign ``rank`` = global position of each row in ``md5(f"{id}:{seed}")``
    order (ties broken by id; 0-based).  Output: ``(id_col, rank)``."""
    import ray

    from dedup_ray.util.exchange import exchange_group_apply

    def keyed(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        dg = content_digest([f"{v}:{seed}" for v in ids], algo="md5")
        return pa.table({
            id_col: t[id_col],
            "skey": pa.array(dg, pa.string()),
            "bucket": pa.array(_hex2_to_int(dg)),
        })

    with_key = ds.map_batches(keyed, batch_format="pyarrow").materialize()

    counts = with_key.groupby("bucket").count().to_pandas()
    if counts.empty:  # empty corpus — keep the id TYPE
        import ray.data

        from dedup_ray.stages.packing import _schema_type

        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], _schema_type(with_key, id_col)),
            "rank": pa.array([], pa.int64()),
        }))
    counts = counts.sort_values("bucket")
    buckets = counts["bucket"].to_numpy()
    offsets = np.r_[0, np.cumsum(counts["count()"].to_numpy())[:-1]]
    offset_ref = ray.put((buckets, offsets))

    def rank_part(part: pa.Table) -> pa.Table:
        id_type = part[id_col].type if id_col in part.column_names \
            else pa.int64()
        if part.num_rows == 0:
            return pa.table({
                id_col: pa.array([], id_type),
                "rank": pa.array([], pa.int64()),
            })
        bks, offs = ray.get(offset_ref) \
            if not isinstance(offset_ref, tuple) else offset_ref
        ids = part[id_col].to_numpy(zero_copy_only=False)
        keys = np.asarray(part["skey"].to_pylist(), dtype=object)
        bkt = part["bucket"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, keys, bkt))
        bkt_s = bkt[order]
        first = np.r_[True, bkt_s[1:] != bkt_s[:-1]]
        local = np.arange(len(order), dtype=np.int64)
        base = np.repeat(local[first], np.diff(
            np.r_[np.flatnonzero(first), len(order)]
        ))
        rank = offs[np.searchsorted(bks, bkt_s)] + (local - base)
        return pa.table({
            id_col: pa.array(ids[order], id_type),
            "rank": pa.array(rank),
        })

    return exchange_group_apply(with_key, "bucket", rank_part,
                                num_partitions)
