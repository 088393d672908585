"""End-to-end near-duplicate detection + clustering pipeline.

The Ray-Data-native re-expression of the reference's whole DAG
(SURVEY.md §3 / §7.1)::

    pages(url, warc_ts, html, text, lang)
      → ONE streaming pass over text:  map_batches(extract)
          → map_batches(MinHashSigner actor pool, include_digest=True)
          → compact table (url, digest, n_shingles, sig)   [~1KB/doc]
      → exact path:   groupby(digest) → star edges
      → near path:    band explode → groupby(band, bhash) → candidate pairs
                      → signature joins → est-Jaccard ≥ τ
      → union(exact, near) edges → connected components
      → clusters(url, cluster_id)

Raw text/html is never materialized — only the compact signature table is
(object store, spillable), which is what makes the plan viable at 10^12
docs.  Shuffle keys in order: digest, (band, bhash), (id1, id2), id (sig
joins), component.  With ``checkpoint_dir`` each stage boundary persists via
``CheckpointContext`` and a rerun reuses completed stages.
"""

from __future__ import annotations

from dedup_ray.config import DedupConfig
from dedup_ray.ops.evaluate import pairwise_prf_ds
from dedup_ray.stages.cc import assign_clusters
from dedup_ray.stages.exact import exact_dup_edges
from dedup_ray.stages.extract import extract_batch
from dedup_ray.stages.lsh import band_explode, candidate_pairs
from dedup_ray.stages.signer import sign_docs
from dedup_ray.stages.simhash import simhash_edges
from dedup_ray.stages.substring import substring_edges
from dedup_ray.stages.verify import verify_pairs
from dedup_ray.state.manifest import CheckpointContext


def compact_signature_table(
    pages_ds,
    config: DedupConfig,
    id_col: str = "url",
    extract: bool = True,
    with_simhash: bool = True,
    with_chunks: bool = True,
):
    """pages → (id, digest, n_shingles, sig[, simhash][, chunks]): ONE text pass."""
    ds = pages_ds
    if extract:
        ds = ds.map_batches(
            extract_batch, batch_format="pyarrow", batch_size=config.batch_size
        )
    return sign_docs(
        ds,
        config,
        id_col=id_col,
        with_simhash=with_simhash,
        with_chunks=with_chunks,
    )


def dedup_pipeline(
    pages_ds,
    config: DedupConfig | None = None,
    id_col: str = "url",
    extract: bool = True,
    checkpoint_dir: str | None = None,
    use_minhash: bool = True,
    use_simhash: bool = False,
    use_substring: bool = True,
):
    """pages → clusters Dataset(id_col, cluster_id).

    Returns ``(clusters_ds, ctx)`` where ctx is the CheckpointContext (or
    None when checkpointing is off).
    """
    cfg = config or DedupConfig()
    ctx = (
        CheckpointContext(root=checkpoint_dir, config_hash=cfg.config_hash())
        if checkpoint_dir
        else None
    )

    def stage(name, fn, materialize=False):
        if ctx is None:
            ds = fn()
            return ds.materialize() if materialize else ds
        return ctx.run_stage(name, fn)

    compact = stage(
        "signatures",
        lambda: compact_signature_table(
            pages_ds,
            cfg,
            id_col,
            extract,
            with_simhash=use_simhash,
            with_chunks=use_substring,
        ),
        materialize=True,  # consumed by every path: edges, joins, final ids
    )

    def _pin(ds):
        """Force (id1: string, id2: string) so empty parts union cleanly.

        An edge path that found nothing yields zero-row pandas-born blocks
        whose columns type as Arrow ``null``; casting pins the schema so the
        lazy union (and a checkpoint parquet write) never sees a mismatch.
        """
        import pyarrow as pa

        def cast(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "id1": t["id1"].combine_chunks().cast(pa.string()),
                    "id2": t["id2"].combine_chunks().cast(pa.string()),
                }
            )

        return ds.select_columns(["id1", "id2"]).map_batches(
            cast, batch_format="pyarrow"
        )

    exact_e = stage(
        "exact_edges",
        lambda: exact_dup_edges(
            compact, id_col=id_col, num_partitions=cfg.num_partitions
        ),
    )
    edge_parts = [_pin(exact_e)]

    if use_minhash:

        def _near():
            bands = band_explode(compact, cfg, id_col=id_col)
            cands = candidate_pairs(bands, cfg, id_col=id_col, global_dedup=False)
            return verify_pairs(cands, compact, cfg, id_col=id_col)

        near = stage("near_edges", _near)
        edge_parts.append(_pin(near))

    if use_simhash:
        sim = stage("simhash_edges", lambda: simhash_edges(compact, cfg, id_col))
        edge_parts.append(_pin(sim))

    if use_substring:
        sub = stage("substring_edges", lambda: substring_edges(compact, cfg, id_col))
        edge_parts.append(_pin(sub))

    def _edges():
        # Lazy union: no per-part materialize barrier — the streaming
        # executor runs all edge paths concurrently off the shared
        # (materialized) signature table.  Duplicate edges across paths are
        # harmless to union-find CC.
        out = edge_parts[0]
        for part in edge_parts[1:]:
            out = out.union(part)
        return out

    edges = stage("edges", _edges)
    clusters = stage(
        "clusters",
        lambda: assign_clusters(
            compact,
            edges,
            id_col=id_col,
            local_edge_limit=cfg.cc_local_edge_limit,
            num_partitions=cfg.num_partitions,
        ),
    )
    return clusters, ctx


def dedup_and_score(pages_ds, truth_ds, config: DedupConfig | None = None,
                    id_col: str = "url"):
    """Run the pipeline and score against a truth clustering (F1/recall)."""
    cfg = config or DedupConfig()
    clusters, _ = dedup_pipeline(pages_ds, cfg, id_col=id_col)
    clusters = clusters.materialize()
    metrics = pairwise_prf_ds(
        clusters, truth_ds, id_col=id_col, num_partitions=cfg.num_partitions
    )
    return clusters, metrics
