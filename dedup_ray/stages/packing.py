"""Sequence packing: assign documents to fixed-token-budget training
sequences in a deterministic global order — the distributed prefix-scan
pattern.

An LLM pretraining pipeline packs documents into fixed-length sequences
(e.g. 2048 tokens).  The streaming form used here: documents are laid out
in ``order_col`` order, token counts accumulate, and a document's sequence
id is ``floor(tokens_before / budget)`` (a document may straddle a budget
boundary and start mid-sequence at ``tokens_before % budget``).  This is a
global EXCLUSIVE PREFIX SUM — the one primitive Ray Data's relational
surface lacks — implemented as a two-level scan:

1. coarse range buckets (``order // bucket_width``) are summed with one
   small grouped aggregate; the per-bucket totals stream to the driver
   (corpus_size / bucket_width rows — at 10¹² docs with 2²⁰-wide buckets
   that is ~10⁶ tiny rows; a third scan level amortizes further if needed)
   where an ``np.cumsum`` produces each bucket's exclusive offset,
   broadcast back via ``ray.put``;
2. one exchange co-locates each bucket, sorts it by ``order_col`` and
   cumsums locally, adding the bucket offset.

Every heavy step is an existing engine primitive (map_batches, one small
aggregate, one exchange); the driver touches only bucket-granular sums.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _schema_type(ds, col: str) -> pa.DataType:
    """Arrow type of ``col`` from a (possibly empty) Dataset's schema;
    int64 when the schema itself is unknown."""
    try:
        s = ds.schema()
        return dict(zip(s.names, s.types))[col]
    except Exception:
        return pa.int64()


def token_counts(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Append whitespace token count (split on single space, no empty-token
    filtering — the count every packing consumer sees)."""

    def f(t: pa.Table) -> pa.Table:
        txt = t[text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        txt = pc.coalesce(txt, pa.scalar("", txt.type))  # null text == ""
        n = pc.list_value_length(pc.split_pattern(txt, " "))
        return pa.table({
            id_col: t[id_col],
            "n_tokens": pc.cast(n, pa.int64()),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def pack_sequences(ds_counts, budget: int, id_col: str = "doc_id",
                   bucket_width: int = 4096, num_partitions: int = 16):
    """Assign ``(seq_id, seq_offset)`` per document from ``(id, n_tokens)``
    rows, packing in ``id_col`` order into ``budget``-token sequences.

    Output: ``(id_col, n_tokens, seq_id, seq_offset)``.
    """
    import ray

    from dedup_ray.util.exchange import exchange_group_apply

    def bucketize(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array(ids // bucket_width, pa.int64())
        )

    with_bucket = ds_counts.map_batches(
        bucketize, batch_format="pyarrow"
    ).materialize()

    # level-1 scan: per-bucket sums -> driver cumsum -> broadcast offsets.
    # The aggregate output is bucket-granular (tiny), not corpus-granular.
    sums = with_bucket.groupby("bucket").sum("n_tokens").to_pandas()
    if sums.empty:  # empty corpus: nothing to pack — keep the id TYPE
        import ray.data

        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], _schema_type(with_bucket, id_col)),
            "n_tokens": pa.array([], pa.int64()),
            "seq_id": pa.array([], pa.int64()),
            "seq_offset": pa.array([], pa.int64()),
        }))
    sums = sums.sort_values("bucket")
    buckets = sums["bucket"].to_numpy()
    totals = sums["sum(n_tokens)"].to_numpy()
    offsets = np.r_[0, np.cumsum(totals)[:-1]]
    offset_ref = ray.put((buckets, offsets))

    def assign(part: pa.Table) -> pa.Table:
        bks, offs = ray.get(offset_ref) if not isinstance(offset_ref, tuple) \
            else offset_ref
        id_type = part[id_col].type if id_col in part.column_names \
            else pa.int64()
        if part.num_rows == 0:
            return pa.table({
                id_col: pa.array([], id_type),
                "n_tokens": pa.array([], pa.int64()),
                "seq_id": pa.array([], pa.int64()),
                "seq_offset": pa.array([], pa.int64()),
            })
        ids = part[id_col].to_numpy(zero_copy_only=False)
        ntok = part["n_tokens"].to_numpy(zero_copy_only=False)
        bkt = part["bucket"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, bkt))
        ids_s, ntok_s, bkt_s = ids[order], ntok[order], bkt[order]
        # local exclusive cumsum restarting per bucket
        cum = np.cumsum(ntok_s) - ntok_s
        first = np.r_[True, bkt_s[1:] != bkt_s[:-1]]
        base = np.repeat(cum[first], np.diff(np.r_[np.flatnonzero(first),
                                                   len(bkt_s)]))
        local_before = cum - base
        glob = offs[np.searchsorted(bks, bkt_s)]
        before = glob + local_before
        return pa.table({
            id_col: pa.array(ids_s, part[id_col].type),
            "n_tokens": pa.array(ntok_s),
            "seq_id": pa.array(before // budget),
            "seq_offset": pa.array(before % budget),
        })

    return exchange_group_apply(
        with_bucket, "bucket", assign, num_partitions
    )


def chunk_tokens(
    ds,
    window: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Overlapping fixed-token chunks per document — the context-window
    preprocessing step (chunk i covers tokens [i·stride, i·stride+window);
    consecutive chunks overlap by window−stride, every token is covered,
    the tail chunk may be short).

    Shuffle-free: one streaming pass; each output row is
    ``(id, chunk_id, chunk_text)``.  Empty documents emit one empty chunk
    so downstream joins never lose the document.  Vectorized: tokens are
    flattened once per batch (Arrow split + numpy offset math); only the
    final per-chunk string join is per-output-row.
    """
    if not (0 < stride <= window):
        raise ValueError("need 0 < stride <= window")

    def f(batch: pa.Table) -> pa.Table:
        from dedup_ray.stages.textstats import explode_tokens

        nrows = batch.num_rows
        flat_pa, parents, n = explode_tokens(batch[text_col], nrows)
        flat = np.asarray(flat_pa.to_pylist(), dtype=object)
        starts_of_doc = np.zeros(nrows, dtype=np.int64)
        np.cumsum(n[:-1], out=starts_of_doc[1:]) if nrows > 1 else None
        # chunk count per doc: len(range(0, max(n-(w-s), 1), s))
        span = np.maximum(n - (window - stride), 1)
        n_chunks = -(-span // stride)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        out_id, out_cid, out_txt = [], [], []
        for r in range(nrows):
            base = starts_of_doc[r]
            for c in range(n_chunks[r]):
                lo = base + c * stride
                hi = min(base + c * stride + window, base + n[r])
                out_id.append(ids[r])
                out_cid.append(c)
                out_txt.append(" ".join(flat[lo:hi]))
        return pa.table(
            {
                id_col: pa.array(out_id, batch[id_col].type),
                "chunk_id": pa.array(out_cid, pa.int64()),
                "chunk_text": pa.array(out_txt, pa.string()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")
