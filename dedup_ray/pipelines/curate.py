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
                    with_line_dedup: bool = True, num_partitions: int = 16,
                    checkpoint_dir: str | None = None):
    """Run the curation chain over ``(id, text)`` documents; returns the
    curated ``(id, text)`` Dataset (or ``(ds, ctx)`` when
    ``checkpoint_dir`` is set — same contract as ``dedup_pipeline``).

    With a checkpoint dir the two shuffle-bounded products checkpoint
    (``kept_lines`` after the line-dedup exchange, ``curated`` after
    reassembly); the batch-local screen/redaction stages re-stream — they
    are cheaper than their own checkpoint I/O.  The lineage hash covers
    the pipeline shape AND the rule constants (quality bounds, PII rules,
    line width), so editing a rule invalidates stale checkpoints.
    """
    from dedup_ray.stages.webclean import (
        LINE_WIDTH,
        PII_RULES,
        QUALITY_BOUNDS,
        explode_token_lines,
        line_dedup,
        quality_filter,
        reassemble_docs,
        redact_pii,
    )

    ctx = None
    if checkpoint_dir:
        import hashlib

        from dedup_ray.state.manifest import CheckpointContext

        shape = (
            f"curate|id={id_col}|text={text_col}|q={with_quality}"
            f"|pii={with_pii}|ld={with_line_dedup}|np={num_partitions}"
            f"|w={LINE_WIDTH}|qb={sorted(QUALITY_BOUNDS.items())}"
            f"|rules={PII_RULES}"
        )
        ctx = CheckpointContext(
            root=checkpoint_dir,
            config_hash=hashlib.sha256(shape.encode()).hexdigest()[:16],
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
        def _kept():
            lines = explode_token_lines(ds, text_col=text_col,
                                        id_col=id_col)
            return line_dedup(lines, id_col=id_col,
                              num_partitions=num_partitions)

        kept = ctx.run_stage("kept_lines", _kept) if ctx else _kept()
        _cur = lambda: reassemble_docs(  # noqa: E731
            kept, id_col=id_col, num_partitions=num_partitions
        )
        ds = ctx.run_stage("curated", _cur) if ctx else _cur()
    elif ctx:
        ds = ctx.run_stage("curated", lambda: ds)
    return (ds, ctx) if checkpoint_dir else ds
