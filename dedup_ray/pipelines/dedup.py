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

import pyarrow as pa

from dedup_ray.config import DedupConfig
from dedup_ray.ops.evaluate import pairwise_prf_ds
from dedup_ray.stages.cc import assign_clusters
from dedup_ray.stages.extract import extract_batch
from dedup_ray.stages.lsh import candidate_pairs
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
        # sign_batch_size, not batch_size: this map fuses into the sign
        # stage and the fused chain's task granularity is the max declared
        # batch size, counted in chain-input rows (see config.sign_batch_size)
        ds = ds.map_batches(
            extract_batch, batch_format="pyarrow", batch_size=config.sign_batch_size
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
    use_simhash: bool = True,
    use_substring: bool = True,
    pages_parts: list | None = None,
    tier_edges_out: dict | None = None,
    tier_edges_only: bool = False,
    extra_edges: list | None = None,
):
    """pages → clusters Dataset(id_col, cluster_id).

    Returns ``(clusters_ds, ctx)`` where ctx is the CheckpointContext (or
    None when checkpointing is off).

    ``tier_edges_out`` — optional dict the pipeline fills with the edge
    Dataset of each enabled tier (``"exact"``, ``"near_minhash"``,
    ``"near_simhash"``, ``"substring"``), pinned to ``(id1, id2)``.
    Observability hook for per-tier attribution (``dedup_tier_report``);
    costs nothing when None (the same datasets are built either way).
    With ``tier_edges_only`` the call returns ``(None, ctx)`` right after
    the tiers are populated, skipping the final edge union + clustering —
    for consumers (the tier report) that run their own CC passes.
    Requires ``tier_edges_out`` (the flag is meaningless without a place
    to put the tiers).

    ``extra_edges`` — optional list of caller-supplied edge Datasets
    ``(id1, id2, …)``, e.g. the embedding-cosine tier
    (``stages/embed.cosine_dup_edges``) or a custom scorer, unioned into
    phase 1 alongside the built-in tiers (so the substring pass also runs
    on the merged representatives).  The §2.12 extension point at the
    pipeline level.  Like the pages input, their CONTENT is not part of
    the checkpoint lineage — reruns that change extra edge data need a
    fresh ``checkpoint_dir`` (the count is mixed into the shape hash).

    ``pages_parts`` — optional ``[(part_id, fn)]`` where ``fn() -> Dataset``
    yields one slice of the pages input (e.g. one input-file group).  With
    ``checkpoint_dir`` set, the signature stage then commits per part and a
    rerun re-signs only uncommitted parts (``CheckpointContext.
    run_stage_parts``); ``pages_ds`` is ignored for signing in that case.
    """
    if tier_edges_only and tier_edges_out is None:
        raise ValueError("tier_edges_only requires tier_edges_out")
    cfg = config or DedupConfig()
    # Native id dtype (string urls OR int64 doc ids) — threaded to every
    # edge/label schema below.  ``schema()`` on a fresh read is a
    # metadata-only fetch; on in-memory inputs it is already computed.
    try:
        id_type = pages_ds.schema().base_schema.field(id_col).type
    except Exception:
        id_type = pa.string()
    # Lineage covers the pipeline SHAPE, not just cfg: rerunning the same
    # checkpoint dir with e.g. --no-substring or a different id_col must
    # invalidate, or stale 'signatures'/'edges' checkpoints (wrong columns,
    # wrong paths merged) would be silently reused.
    import hashlib

    shape = (
        f"{cfg.config_hash()}|id={id_col}|extract={extract}"
        f"|mh={use_minhash}|sh={use_simhash}|ss={use_substring}"
        f"|xe={len(extra_edges or [])}"
    )
    lineage_hash = hashlib.sha256(shape.encode()).hexdigest()[:16]
    ctx = (
        CheckpointContext(root=checkpoint_dir, config_hash=lineage_hash)
        if checkpoint_dir
        else None
    )

    import os
    import time as _time

    timing = os.environ.get("DEDUP_STAGE_TIMING") == "1"

    def stage(name, fn, materialize=False):
        t0 = _time.perf_counter()
        if ctx is None:
            ds = fn()
            if materialize:
                ds = ds.materialize()
        else:
            ds = ctx.run_stage(name, fn)
        if timing:
            # lazy stages report ~0 here; their cost lands in the next
            # materialize barrier / the final consumer
            print(
                f"[stage-timing] {name}: "
                f"{_time.perf_counter() - t0:.2f}s",
                flush=True,
            )
        return ds

    def _sign(part_pages):
        return compact_signature_table(
            part_pages,
            cfg,
            id_col,
            extract,
            with_simhash=use_simhash,
            with_chunks=use_substring,
        )

    if pages_parts is not None and ctx is not None:
        t0 = _time.perf_counter()
        compact = ctx.run_stage_parts(
            "signatures",
            [(pid, (lambda f=fn: _sign(f()))) for pid, fn in pages_parts],
        )
        if timing:
            print(
                f"[stage-timing] signatures(parts): "
                f"{_time.perf_counter() - t0:.2f}s",
                flush=True,
            )
    else:
        compact = stage(
            "signatures",
            lambda: _sign(pages_ds),
            materialize=True,  # consumed by every path: edges, joins, final ids
        )

    if cfg.auto_partitions and not cfg.partitions_pinned:
        # Exchanges pay ~num_partitions² shuffle-block overhead, so the
        # partition count follows the DATA (see config.py): derived here
        # because the materialized signature table makes count() a
        # metadata read.  Rebinding cfg is safe — num_partitions is an
        # execution knob (not semantics, not lineage: the shape hash is
        # already fixed above, and identical corpora re-derive the same
        # count on resume).
        import dataclasses
        import math as _math

        # Upper clamp 65536: ~1.5 GB of signature rows per partition at
        # 10^9 docs/partition-group scale; beyond ~250k inter-partition
        # refs the exchanges switch to their hierarchical two-level form
        # (util/exchange.py), so ref count does not bound the clamp.
        n_docs_sig = compact.count()
        cfg = dataclasses.replace(
            cfg,
            num_partitions=min(
                65536,
                max(8, _math.ceil(n_docs_sig / cfg.docs_per_partition)),
            ),
        )

    from dedup_ray.util.dsutil import pin_edge_ids, split_mixed_rows

    def _pin(ds):
        return pin_edge_ids(ds, id_type)

    # Exact dedup FIRST: one digest shuffle yields the exact-duplicate star
    # edges AND the representative set (min-id member per distinct text).
    # Every similarity path below runs on REPRESENTATIVES — k identical
    # docs have k identical signatures, so raw-corpus banding would emit
    # O(k²·bands) candidate rows per group where reps cost one row.
    from dedup_ray.stages.exact import exact_rep_partition

    compact_cols = [id_col, "digest", "n_shingles", "sig"]
    if use_simhash:
        compact_cols.append("simhash")
    if use_substring:
        compact_cols.append("chunks")

    mixed = stage(
        "exact_partition",
        lambda: exact_rep_partition(
            compact, id_col=id_col, num_partitions=cfg.num_partitions
        ),
        materialize=True,
    )

    exact_e = split_mixed_rows(mixed, ["id1", "id2"], want_edges=True)
    edge_parts = [_pin(exact_e)]
    _TIER_NAMES = {"near_edges": "near_minhash", "simhash_edges": "near_simhash"}
    if tier_edges_out is not None:
        tier_edges_out["exact"] = edge_parts[0]
    for i, xe in enumerate(extra_edges or []):
        pinned_xe = _pin(xe.select_columns(["id1", "id2"]))
        edge_parts.append(pinned_xe)
        if tier_edges_out is not None:
            tier_edges_out[f"extra{i}"] = pinned_xe

    # One set of representative block refs shared by the similarity
    # branches: raw-task split off the materialized mixed table, so
    # neither branch launches a plan execution to re-derive reps (each
    # such launch is constant-seconds of barrier latency regardless of
    # CPU count — the 8→32-CPU scaling gap measured in BASELINE.md).
    from dedup_ray.util.exchange import map_refs

    import pyarrow.compute as pc

    def _rep_split(t: pa.Table) -> pa.Table:
        if "id1" not in t.column_names:  # void block
            return t
        return t.filter(pc.is_null(t["id1"])).select(compact_cols)

    rep_refs = map_refs(mixed, _rep_split)

    branch_stages = []

    if use_minhash:

        def _near():
            # Whole branch is ONE chained task graph: band explode (raw
            # task map) → band-bucket exchange → two signature joins with
            # the est-Jaccard cut fused into the second join's reduce.
            # No dedicated (id1,id2) dedup round either: the first verify
            # join co-partitions every (id1, *) row by hash(id1), so its
            # partition-local drop_duplicates IS a global dedup.
            from dedup_ray.stages.lsh import BandExploder

            bander = BandExploder(cfg, id_col=id_col)

            def band_block(t: pa.Table) -> pa.Table:
                if "sig" not in t.column_names:  # void block
                    return t
                return bander(t.select([id_col, "sig"]))

            bands = map_refs(rep_refs, band_block)
            cands = candidate_pairs(
                bands, cfg, id_col=id_col, global_dedup=False,
                id_type=id_type, return_refs=True,
            )
            return verify_pairs(
                cands, rep_refs, cfg, id_col=id_col, id_type=id_type
            )

        branch_stages.append(("near_edges", _near))

    if use_simhash:
        branch_stages.append(
            ("simhash_edges",
             lambda: simhash_edges(rep_refs, cfg, id_col, id_type))
        )

    # Materialize the similarity branches CONCURRENTLY: a lazy union would
    # execute them back-to-back (Ray Data runs one streaming plan per
    # driver thread), serializing their shuffle barriers.  Each branch's
    # all-to-all rounds cost seconds of fixed latency regardless of CPU
    # count, so overlapping branches is a direct scaling-efficiency win.
    if len(branch_stages) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=len(branch_stages)) as pool:
            futs = [
                pool.submit(stage, name, fn, True) for name, fn in branch_stages
            ]
            for (name, _), f in zip(branch_stages, futs):
                pinned = _pin(f.result())
                edge_parts.append(pinned)
                if tier_edges_out is not None:
                    tier_edges_out[_TIER_NAMES[name]] = pinned
    else:
        for name, fn in branch_stages:
            pinned = _pin(stage(name, fn))
            edge_parts.append(pinned)
            if tier_edges_out is not None:
                tier_edges_out[_TIER_NAMES[name]] = pinned

    def _lazy_union(parts):
        # Lazy union: no per-part materialize barrier — the streaming
        # executor runs all edge paths concurrently off the shared
        # (materialized) signature table.  Duplicate edges across paths are
        # harmless to union-find CC.
        out = parts[0]
        for part in parts[1:]:
            out = out.union(part)
        return out

    def _assign(edge_ds):
        return assign_clusters(
            compact,
            edge_ds,
            id_col=id_col,
            local_edge_limit=cfg.cc_local_edge_limit,
            num_partitions=cfg.num_partitions,
            id_type=id_type,
        )

    if not use_substring:
        if tier_edges_out is not None and tier_edges_only:
            return None, ctx
        edges = stage("edges", lambda: _lazy_union(edge_parts))
        clusters = stage("clusters", lambda: _assign(edges))
        return clusters, ctx

    # Substring path runs on CLUSTER REPRESENTATIVES of the exact+near
    # phase, not the raw corpus: a k-duplicate clique shares nearly all its
    # CDC chunks, so chunk-bucket pair emission over raw docs is O(k²) per
    # clique for pairs the near path has already connected.  Phase-1 CC
    # labels identify one representative per cluster (the min-id member);
    # anti-joining the NON-representatives (a set the size of the dup
    # surplus, not the corpus) restricts the substring path to reps.
    #
    # Recall trade, stated explicitly: this preserves phase-1 CONNECTIVITY
    # (a substring edge between reps merges their phase-1 clusters
    # transitively in the final CC) but not full substring RECALL — a
    # containment that holds only for a non-representative member (C
    # contains B verbatim, B's rep A differs inside the shared region) is
    # never tested.  Acceptable because phase-1 members are ≥τ-similar to
    # their rep, so the missed containments are near-duplicates of tested
    # ones; corpus-wide substring dedup remains available via
    # use_minhash=False/use_simhash=False (every doc is then its own rep).
    # Note boilerplate_max_df is likewise counted over REPS, not corpus
    # docs — the df of template boilerplate only shrinks by the dup factor,
    # which is the intended direction (more templates identified, not fewer
    # true containments, since true containments are low-df by definition).
    # No materialize barrier: every part is already materialized and
    # pinned, so the union is a ref concat — re-executing it per CC
    # pass recomputes nothing, while a stage materialize here copied
    # every edge block once more on the serial path (round-3 verdict
    # item #5).  With a checkpoint ctx the stage still persists.
    phase1_edges = stage("phase1_edges", lambda: _lazy_union(edge_parts))

    # Phase-1 CC runs ONCE; its labels serve both the substring rep
    # filter (below) and the final clustering, where each phase-1 cluster
    # enters as a STAR (cluster_id → member) — exactly
    # connectivity-preserving, and strictly no larger than the raw
    # multigraph (exact stars + MinHash pairs + SimHash pairs with
    # cross-tier duplicates), so the final CC's input shrinks to
    # n_dup_nodes + n_substring_edges.
    _labels1_cache: list = []

    def _phase1_labels():
        if not _labels1_cache:
            from dedup_ray.stages.cc import component_labels

            # materialize the slim 2-column projection once (the
            # assign_clusters convention): component_labels consumes its
            # input twice (count + CC), and a lazy union would re-run
            # the pin/split maps over every edge part on each pass
            slim = phase1_edges.select_columns(["id1", "id2"]).materialize()
            labels = component_labels(slim, cfg.cc_local_edge_limit)
            _labels1_cache.append(
                labels.materialize() if labels is not None else None
            )
        return _labels1_cache[0]

    def _non_reps():
        import pyarrow.compute as pc
        import ray.data

        labels = _phase1_labels()
        if labels is None:
            return ray.data.from_arrow(pa.table({id_col: pa.array([], id_type)}))
        return labels.map_batches(
            lambda t: pa.table(
                {id_col: t["id"].combine_chunks().cast(id_type)}
            ).filter(pc.not_equal(t["id"], t["cluster_id"])),
            batch_format="pyarrow",
        )

    def _sub_edges():
        from dedup_ray.util.exchange import exchange_join

        def _chunks_only(t: pa.Table) -> pa.Table:
            if "chunks" not in t.column_names:  # void block
                return t
            return t.select([id_col, "chunks"])

        rep_chunks = exchange_join(
            map_refs(rep_refs, _chunks_only),
            _non_reps(),
            on=id_col,
            how="anti",
            num_partitions=cfg.num_partitions,
            empty_schema=pa.schema(
                [(id_col, id_type), ("chunks", pa.binary())]
            ),
        )
        return substring_edges(rep_chunks, cfg, id_col, id_type=id_type)

    sub = _pin(stage("substring_edges", _sub_edges))
    if tier_edges_out is not None:
        tier_edges_out["substring"] = sub
        if tier_edges_only:
            return None, ctx

    def _final_edges():
        labels = _phase1_labels()
        if labels is None:
            return sub
        star = labels.map_batches(
            lambda t: pa.table(
                {
                    "id1": t["cluster_id"].combine_chunks().cast(id_type),
                    "id2": t["id"].combine_chunks().cast(id_type),
                }
            ),
            batch_format="pyarrow",
        )
        return _lazy_union([star, sub])

    edges = stage("edges", _final_edges)
    clusters = stage("clusters", lambda: _assign(edges))
    return clusters, ctx


def dedup_and_score(pages_ds, truth_ds, config: DedupConfig | None = None,
                    id_col: str = "url", extra_edges: list | None = None):
    """Run the pipeline and score against a truth clustering (F1/recall).
    ``extra_edges`` forwards to :func:`dedup_pipeline` (the §2.12 hook)."""
    cfg = config or DedupConfig()
    clusters, _ = dedup_pipeline(pages_ds, cfg, id_col=id_col,
                                 extra_edges=extra_edges)
    clusters = clusters.materialize()
    metrics = pairwise_prf_ds(
        clusters, truth_ds, id_col=id_col, num_partitions=cfg.num_partitions
    )
    return clusters, metrics
