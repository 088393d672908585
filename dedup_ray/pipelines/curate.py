"""Corpus curation pipeline: quality screen → PII redaction → line-level
dedup → document reassembly.

The standard pre-training curation chain composed from the engine's
web-cleaning operators (``stages/webclean.py``), upstream of the
near-duplicate pipeline (``pipelines/dedup.py``).  Every step is
deterministic, so the WHOLE chain is oracle-checkable end-to-end — the
catalog query ``curate_docs`` runs this function and its DuckDB oracle
re-derives all four stages in SQL.

Dataflow shape (what survives 1000×):

- quality screen: batch-local, fused metric+filter, no shuffle;
- PII redaction: batch-local RE2 kernels, no shuffle;
- line dedup: ONE exchange keyed on the 64-bit line hash;
- reassembly: ONE exchange keyed on the document id.

Two all-to-alls total, both on narrow keys; text payload rides the object
store between them.  A document whose every line is a duplicate of an
earlier document's lines disappears from the output (the C4 behavior).
"""

from __future__ import annotations


def curate_pipeline(docs, id_col: str = "doc_id", text_col: str = "text",
                    with_quality: bool = True, with_pii: bool = True,
                    with_line_dedup: bool = True, num_partitions: int = 16):
    """Run the curation chain over ``(id, text)`` documents; returns the
    curated ``(id, text)`` Dataset."""
    from dedup_ray.stages.webclean import (
        explode_token_lines,
        line_dedup,
        quality_filter,
        reassemble_docs,
        redact_pii,
    )

    ds = docs
    if with_quality:
        ds = quality_filter(ds, text_col=text_col, id_col=id_col)
    if with_pii:
        import pyarrow as pa

        redacted = redact_pii(ds, text_col=text_col, out_col="__clean")

        def swap(t: pa.Table) -> pa.Table:
            return pa.table({id_col: t[id_col], text_col: t["__clean"]})

        ds = redacted.map_batches(swap, batch_format="pyarrow")
    if with_line_dedup:
        lines = explode_token_lines(ds, text_col=text_col, id_col=id_col)
        kept = line_dedup(lines, id_col=id_col,
                          num_partitions=num_partitions)
        ds = reassemble_docs(kept, id_col=id_col,
                             num_partitions=num_partitions)
    return ds
