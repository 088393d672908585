"""Incremental dedup: cluster a NEW shard against a persisted index.

The 100-TB operating mode the batch pipeline cannot cover: a crawl
delivers shards continuously, and re-deduplicating the whole corpus per
shard is O(corpus) per arrival.  This pipeline touches O(shard) instead —
the reference has no analog (its corpus is fixed); the design follows the
same exact-first/representative discipline as ``pipelines/dedup.py``.

Plan (every step O(shard), never O(corpus))::

    shard pages ──sign──► compact(id, digest, sig)
      ├─ in-shard exact:  digest shuffle → star edges + representatives
      ├─ exact vs index:  reps ⋈ index digests      (bucket-pruned read)
      ├─ near  vs index:  reps bands ⋈ index bands  (bucket-pruned read)
      │                     → verify est-Jaccard vs index sigs
      ├─ in-shard near:   LSH candidate pairs over reps → verify
      └─ CC over (shard ids ∪ anchor cluster ids)
           → stable relabel: components with an anchor keep the MIN OLD
             cluster id; ≥2 anchors in one component = a cluster MERGE,
             recorded (retired → final) instead of rewriting the index.

Bucket pruning is the scale lever: the shard computes the digest / band /
sig bucket ids it needs locally and reads exactly those index directories
(`state/dedupindex.read_buckets`), so index I/O is proportional to the
shard's key spread, not the corpus.  Anchors are OLD CLUSTER IDS used as
CC nodes — linking a new doc to its anchor reuses the existing cluster
without loading its members.

Covers the exact + MinHash paths always, and the substring/CDC containment
path when the index was built from a ``with_chunks`` signature table
(``state/dedupindex`` chunks/chunkblobs tables): shard chunk hashes join
bucket-pruned index chunk rows, document frequency is bucket-locally exact
so boilerplate chunks (cookie banners) are excluded without a global
census, and accepted shared-run edges anchor like the near path.  The
in-shard substring pass reuses the batch plan; its boilerplate census is
shard-local (same per-run semantics as the batch pipeline).
"""

from __future__ import annotations

from dataclasses import replace

import numpy as np
import pandas as pd
import pyarrow as pa

from dedup_ray.config import DedupConfig
from dedup_ray.state.dedupindex import (
    append_index,
    append_merges,
    band_bucket,
    load_manifest,
    load_merges,
    read_buckets,
)
from dedup_ray.state.partwrite import _bucket_of


def _empty_ds(schema: pa.Schema):
    import ray.data

    return ray.data.from_arrow(schema.empty_table())


def _remap_anchor_col(col: pa.ChunkedArray, merges: dict, idt) -> pa.Array:
    """Resolve retired cluster ids through the merge chain (dict is tiny —
    bounded by cluster merges ever recorded — so a closure beats a join)."""
    if not merges:
        return col.combine_chunks().cast(idt)
    return pa.array(
        [merges.get(v, v) for v in col.to_pylist()], idt
    )


def _bucket_ids(ds, fn) -> list:
    """Distinct bucket ids present in ``ds`` (≤ num_buckets values reach
    the driver — the per-batch fn collapses rows to bucket ids first)."""

    def tag(t: pa.Table) -> pa.Table:
        return pa.table(
            {"b": pa.array(np.unique(fn(t)), pa.int64())}
        )

    return ds.map_batches(tag, batch_format="pyarrow").unique("b")


def dedup_against_index(
    shard_ds,
    index_root: str,
    config: DedupConfig | None = None,
    extract: bool = False,
    update_index: bool = False,
    with_substring: bool | None = None,
):
    """Shard pages → ``(clusters_ds(id, cluster_id), report)``.

    ``cluster_id`` is an EXISTING cluster id when the doc duplicates
    indexed content (exactly, near, or — when the index carries chunk
    tables — by substring containment), else a fresh id (min new member).
    ``with_substring=None`` follows the index (on iff it has chunk
    tables); forcing ``True`` against a chunk-less index raises.
    ``report`` counts each path's contribution plus recorded merges.
    With ``update_index`` the shard's signatures are appended to the index
    under their final labels and merges are persisted, so the next shard
    sees this one.
    """
    from dedup_ray.pipelines.dedup import compact_signature_table
    from dedup_ray.stages.cc import component_labels
    from dedup_ray.stages.exact import exact_rep_partition
    from dedup_ray.stages.lsh import band_explode, candidate_pairs
    from dedup_ray.stages.verify import verify_pairs
    from dedup_ray.util.exchange import (
        exchange_group_apply,
        exchange_join,
        hash_exchange,
    )

    cfg = config or DedupConfig()
    man = load_manifest(index_root)
    # semantic hash: execution knobs (partitions/concurrency/batch sizes)
    # legitimately differ between the cluster that built the index and the
    # one consuming it; only signature-semantics knobs must match.
    if man["semantic_hash"] != cfg.semantic_hash():
        raise ValueError(
            "index was built with semantically different DedupConfig "
            f"knobs ({man['semantic_hash']} != {cfg.semantic_hash()})"
        )
    id_col = man["id_col"]
    nb = man["num_buckets"]
    has_chunks = man.get("has_chunks", False)
    use_sub = has_chunks if with_substring is None else with_substring
    if use_sub and not has_chunks:
        raise ValueError(
            "with_substring=True but the index has no chunk tables "
            "(build it from a with_chunks signature table)"
        )
    merges_seen = load_merges(index_root)

    compact = compact_signature_table(
        shard_ds, cfg, id_col, extract, with_simhash=False,
        with_chunks=use_sub,
    ).materialize()
    n_docs = compact.count()
    if n_docs == 0:  # empty crawl slice: nothing to anchor, no index change
        idt = pa.type_for_alias(man["id_type"])
        return (
            _empty_ds(pa.schema([(id_col, idt), ("cluster_id", idt)])),
            {
                "n_docs": 0,
                "digest_hits": 0,
                "cross_candidates": 0,
                "cross_edges": 0,
                "hot_buckets_dropped": 0,
                "non_singleton_docs": 0,
                "merges": 0,
            },
        )
    idt = compact.schema().base_schema.field(id_col).type
    # exchange width tracks the SHARD, not the corpus: every all-to-all in
    # this pipeline moves shard-proportional rows (index reads are bucket-
    # pruned), so a small shard over-partitioned at the batch default pays
    # pure task-dispatch latency.  ~1k rows/partition floor, capped at the
    # configured width.  (num_partitions is execution-only — outside
    # semantic_hash — so the adjusted copy is safe everywhere, appends
    # included.)
    cfg = replace(
        cfg,
        num_partitions=max(2, min(cfg.num_partitions, n_docs // 1000 + 1)),
    )

    # ---- in-shard exact: one digest shuffle → reps + star edges ---------
    mixed = exact_rep_partition(
        compact, id_col=id_col, num_partitions=cfg.num_partitions
    ).materialize()

    from dedup_ray.util.dsutil import (
        pin_edge_ids,
        rename_columns,
        split_mixed_rows,
    )

    rep_cols = [id_col, "digest", "n_shingles", "sig"] + (
        ["chunks"] if use_sub else []
    )
    reps = split_mixed_rows(mixed, rep_cols, want_edges=False)
    exact_e = split_mixed_rows(mixed, ["id1", "id2"], want_edges=True)

    anchor_schema = pa.schema([("id1", idt), ("id2", idt)])

    def _anchor_post(t: pa.Table) -> pa.Table:
        # accepted (shard id, old DOC id) + joined cluster_id → anchor edge
        # (shard id, merge-resolved old CLUSTER id)
        return pa.table(
            {
                "id1": t["id1"].combine_chunks().cast(idt),
                "id2": _remap_anchor_col(t["cluster_id"], merges_seen, idt),
            }
        )

    # ---- exact vs index: rep digests ⋈ bucket-pruned index digests ------
    rep_dig = reps.select_columns([id_col, "digest"])
    idx_dig = read_buckets(
        index_root,
        "digests",
        _bucket_ids(rep_dig, lambda t: _bucket_of(t["digest"].to_pylist(), nb)),
    )
    if idx_dig is None:
        digest_hits = _empty_ds(anchor_schema)
    else:

        def to_anchor(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "id1": t[id_col].combine_chunks().cast(idt),
                    "id2": _remap_anchor_col(t["cluster_id"], merges_seen, idt),
                }
            )

        digest_hits = exchange_join(
            rep_dig,
            idx_dig,
            on="digest",
            how="inner",
            num_partitions=cfg.num_partitions,
            post=to_anchor,
            empty_schema=anchor_schema,
        )
    digest_hits = digest_hits.materialize()

    # ---- near vs index: shard bands ⋈ bucket-pruned index bands ---------
    bands = band_explode(reps, cfg, id_col=id_col).materialize()
    idx_bands = read_buckets(
        index_root,
        "bands",
        _bucket_ids(bands, lambda t: band_bucket(t["bhash"].to_numpy(), nb)),
    )
    pair_schema = pa.schema([("id1", idt), ("id2", idt), ("hot", pa.int64())])

    def cross_reduce(lf: pa.Table, rf: pa.Table) -> pa.Table:
        # void-schema guard: a whole stream can be empty for a partition
        if "bhash" not in lf.column_names or "bhash" not in rf.column_names:
            return pair_schema.empty_table()
        ldf = lf.to_pandas()
        rdf = rf.to_pandas()
        # hot-bucket cap, both sides: a boilerplate band bucket with h
        # index members × s shard members would emit h·s pairs; dropping
        # it mirrors lsh's skew policy, and the drop is counted, never
        # silent.  Both sides hold one row per DISTINCT TEXT (shard side =
        # exact reps, index side = digest reps — state/dedupindex), so a
        # bucket only goes hot on genuine content diversity; a 10k-copy
        # syndicated page is ONE row here and its near-dups still anchor.
        n_hot = 0
        for df_side in (ldf, rdf):
            sz = df_side.groupby(["band", "bhash"])["band"].transform("size")
            hot = sz > cfg.max_band_group
            if hot.any():
                keys = df_side.loc[hot, ["band", "bhash"]].drop_duplicates()
                n_hot += len(keys)
                df_side.drop(df_side.index[hot], inplace=True)
        out = ldf.merge(rdf, on=["band", "bhash"], how="inner")[
            ["id1", "id2"]
        ].drop_duplicates()
        out = out[out["id1"] != out["id2"]]
        return pa.table(
            {
                "id1": pa.array(list(out["id1"]) + ([None] if n_hot else []), idt),
                "id2": pa.array(list(out["id2"]) + ([None] if n_hot else []), idt),
                "hot": pa.array(
                    [0] * len(out) + ([n_hot] if n_hot else []), pa.int64()
                ),
            }
        )

    if idx_bands is None:
        cross_mixed = _empty_ds(pair_schema)
    else:
        cross_mixed = hash_exchange(
            [
                rename_columns(bands, {id_col: "id1"}),
                rename_columns(idx_bands, {"id": "id2"}),
            ],
            [["band", "bhash"], ["band", "bhash"]],
            cross_reduce,
            num_partitions=cfg.num_partitions,
        )
    cross_mixed = cross_mixed.materialize()

    import pyarrow.compute as pc

    def _where(ds, mask_fn, cols):
        def f(t: pa.Table) -> pa.Table:
            return t.filter(mask_fn(t)).select(cols)

        return ds.map_batches(f, batch_format="pyarrow")

    hot_buckets = int(cross_mixed.sum("hot") or 0)
    cross_pairs = _where(
        cross_mixed, lambda t: pc.is_valid(t["id1"]), ["id1", "id2"]
    ).materialize()  # read twice (bucket ids + verify) and counted once
    n_cross = cross_pairs.count()

    # ---- verify cross pairs: sigs = shard reps ∪ pruned index sigs ------
    idx_sigs = read_buckets(
        index_root,
        "sigs",
        _bucket_ids(
            cross_pairs.select_columns(["id2"]),
            lambda t: _bucket_of(t["id2"].to_pylist(), nb),
        )
        if n_cross > 0
        else [],
    )
    edge_parts = []
    if idx_sigs is not None:
        idx_sigs = idx_sigs.materialize()

        def as_side(t: pa.Table) -> pa.Table:
            return pa.table(
                {id_col: t["id"].combine_chunks().cast(idt), "sig": t["sig"]}
            )

        side = reps.select_columns([id_col, "sig"]).union(
            idx_sigs.map_batches(as_side, batch_format="pyarrow")
        )
        accepted = verify_pairs(
            cross_pairs, side, cfg, id_col=id_col, id_type=idt
        )

        cross_edges = exchange_join(
            accepted.select_columns(["id1", "id2"]),
            idx_sigs.map_batches(
                lambda t: pa.table(
                    {"id2": t["id"], "cluster_id": t["cluster_id"]}
                ),
                batch_format="pyarrow",
            ),
            on="id2",
            how="inner",
            num_partitions=cfg.num_partitions,
            post=_anchor_post,
            # empty_schema is the POST-output schema (returned directly on
            # void partitions)
            empty_schema=anchor_schema,
        ).materialize()
        edge_parts.append(cross_edges)
    else:
        cross_edges = _empty_ds(anchor_schema)

    # ---- in-shard near edges (same plan as the batch pipeline) ----------
    in_near = verify_pairs(
        candidate_pairs(
            bands, cfg, id_col=id_col, global_dedup=False, id_type=idt
        ),
        reps,
        cfg,
        id_col=id_col,
        id_type=idt,
    )

    # ---- substring/CDC containment path (index chunk tables) ------------
    sub_report = {}
    sub_edges = _empty_ds(anchor_schema)
    if use_sub:
        from dedup_ray.stages.substring import (
            explode_chunks,
            substring_edges,
            verify_substring_pairs,
        )

        # in-shard containment: the batch plan over shard representatives
        in_sub = substring_edges(reps, cfg, id_col=id_col, id_type=idt)
        edge_parts.append(
            in_sub.select_columns(["id1", "id2"]).materialize()
        )

        # cross: shard chunk rows ⋈ bucket-pruned index chunk rows
        chunk_rows = explode_chunks(
            reps.select_columns([id_col, "chunks"]), cfg, id_col
        ).materialize()
        idx_chunks = read_buckets(
            index_root,
            "chunks",
            _bucket_ids(
                chunk_rows, lambda t: band_bucket(t["chash"].to_numpy(), nb)
            ),
        )
        sub_schema = pa.schema(
            [("id1", idt), ("id2", idt), ("hot_chash", pa.int64())]
        )

        def sub_cross_reduce(lf: pa.Table, rf: pa.Table) -> pa.Table:
            if "chash" not in lf.column_names or "chash" not in rf.column_names:
                return sub_schema.empty_table()
            ldf = lf.to_pandas()  # shard (id1, chash)
            rdf = rf.to_pandas()  # index (chash, id2)
            # df is exact here — every index row for a chash lives in this
            # partition, shard occurrences included.  Chunks over the df
            # bound are boilerplate (banners/templates): no pairs, and the
            # marker row feeds the verifier's run-scoring skip set.
            # DISTINCT docs per chash, not raw rows: the index side is
            # (chash, id)-deduped rep rows already, but the shard side is
            # one row per occurrence — a doc repeating one chunk 9× must
            # not turn that chunk into "boilerplate" on its own.
            df = (
                rdf.groupby("chash")["id2"]
                .nunique()
                .add(ldf.groupby("chash")["id1"].nunique(), fill_value=0)
            )
            hot = df.index[df > cfg.boilerplate_max_df]
            out = (
                ldf[~ldf["chash"].isin(hot)]
                .merge(rdf[~rdf["chash"].isin(hot)], on="chash")[
                    ["id1", "id2"]
                ]
                .drop_duplicates()
            )
            out = out[out["id1"] != out["id2"]]
            n_hot = len(hot)
            return pa.table(
                {
                    "id1": pa.array(list(out["id1"]) + [None] * n_hot, idt),
                    "id2": pa.array(list(out["id2"]) + [None] * n_hot, idt),
                    "hot_chash": pa.array(
                        [None] * len(out) + [int(h) for h in hot], pa.int64()
                    ),
                }
            )

        if idx_chunks is None:
            sub_mixed = _empty_ds(sub_schema)
        else:
            sub_mixed = hash_exchange(
                [
                    rename_columns(chunk_rows, {id_col: "id1"}),
                    rename_columns(idx_chunks, {"id": "id2"}),
                ],
                [["chash"], ["chash"]],
                sub_cross_reduce,
                num_partitions=cfg.num_partitions,
            )
        sub_mixed = sub_mixed.materialize()
        hot_sub = frozenset(
            r["hot_chash"]
            for r in _where(
                sub_mixed,
                lambda t: pc.is_valid(t["hot_chash"]),
                ["hot_chash"],
            ).take_all()
        )
        sub_pairs = _where(
            sub_mixed, lambda t: pc.is_valid(t["id1"]), ["id1", "id2"]
        ).materialize()
        n_sub = sub_pairs.count()

        idx_blobs = read_buckets(
            index_root,
            "chunkblobs",
            _bucket_ids(
                sub_pairs.select_columns(["id2"]),
                lambda t: _bucket_of(t["id2"].to_pylist(), nb),
            )
            if n_sub > 0
            else [],
        )
        if idx_blobs is not None:
            idx_blobs = idx_blobs.materialize()
            side = reps.select_columns([id_col, "chunks"]).union(
                idx_blobs.map_batches(
                    lambda t: pa.table(
                        {
                            id_col: t["id"].combine_chunks().cast(idt),
                            "chunks": t["chunks"],
                        }
                    ),
                    batch_format="pyarrow",
                )
            )
            accepted_sub = verify_substring_pairs(
                sub_pairs, side, cfg, id_col=id_col,
                hot_chunks=hot_sub, id_type=idt,
            )
            sub_edges = exchange_join(
                accepted_sub.select_columns(["id1", "id2"]),
                idx_blobs.map_batches(
                    lambda t: pa.table(
                        {"id2": t["id"], "cluster_id": t["cluster_id"]}
                    ),
                    batch_format="pyarrow",
                ),
                on="id2",
                how="inner",
                num_partitions=cfg.num_partitions,
                post=_anchor_post,
                empty_schema=anchor_schema,
            ).materialize()
            edge_parts.append(sub_edges)
        sub_report = {
            "substring_candidates": n_sub,
            "substring_edges": sub_edges.count(),
            "hot_chunks_excluded": len(hot_sub),
        }

    def _pin(ds):
        return pin_edge_ids(ds, idt)

    edges = _pin(exact_e).union(_pin(in_near), _pin(digest_hits))
    for part in edge_parts:
        edges = edges.union(_pin(part))
    edges = edges.materialize()

    # ---- CC + stable relabel against anchors -----------------------------
    report = {
        "n_docs": n_docs,
        "digest_hits": digest_hits.count(),
        "cross_candidates": n_cross,
        "cross_edges": cross_edges.count(),
        "hot_buckets_dropped": hot_buckets,
        **sub_report,
    }

    labels = component_labels(edges, cfg.cc_local_edge_limit)
    if labels is None:
        # no duplicate structure at all: every doc is its own cluster
        final = compact.select_columns([id_col]).map_batches(
            lambda t: pa.table(
                {id_col: t[id_col], "cluster_id": t[id_col]}
            ),
            batch_format="pyarrow",
        ).materialize()
        merges_new = pd.DataFrame({"retired": [], "final": []})
    else:
        labels = labels.map_batches(
            lambda t: pa.table(
                {
                    "id": t["id"].combine_chunks().cast(idt),
                    "lab": t["cluster_id"].combine_chunks().cast(idt),
                }
            ),
            batch_format="pyarrow",
        ).materialize()

        anchors = exchange_group_apply(
            digest_hits.select_columns(["id2"]).union(
                cross_edges.select_columns(["id2"]),
                sub_edges.select_columns(["id2"]),
            ).map_batches(
                lambda t: pa.table(
                    {"id": t["id2"].combine_chunks().cast(idt)}
                ),
                batch_format="pyarrow",
            ),
            "id",
            # Arrow-native dedup: from_pandas on an empty frame would infer
            # a null-typed id column, which acero rejects as a join key
            lambda t: t.group_by("id").aggregate([])
            if "id" in t.column_names and t.num_rows
            else pa.schema([("id", idt)]).empty_table(),
            num_partitions=cfg.num_partitions,
        )

        anchor_lab = exchange_join(
            anchors,
            labels,
            on="id",
            how="inner",
            num_partitions=cfg.num_partitions,
            empty_schema=pa.schema([("id", idt), ("lab", idt)]),
        )

        remap_schema = pa.schema(
            [("lab", idt), ("final", idt), ("retired", idt)]
        )

        def remap_rows(t: pa.Table) -> pa.Table:
            # per CC label: final = min anchor; other anchors are RETIRED
            # (a merge).  Mixed-row output, exact_rep_partition style.
            if "lab" not in t.column_names or t.num_rows == 0:
                return remap_schema.empty_table()
            df = t.to_pandas().drop_duplicates(subset=["lab", "id"])
            df["final"] = df.groupby("lab")["id"].transform("min")
            base = df.drop_duplicates(subset=["lab"])
            ret = df[df["id"] != df["final"]]
            return pa.table(
                {
                    "lab": pa.array(
                        list(base["lab"]) + list(ret["lab"]), idt
                    ),
                    "final": pa.array(
                        list(base["final"]) + list(ret["final"]), idt
                    ),
                    "retired": pa.array(
                        [None] * len(base) + list(ret["id"]), idt
                    ),
                }
            )

        remap_mixed = exchange_group_apply(
            anchor_lab, "lab", remap_rows, cfg.num_partitions
        ).materialize()
        merges_new = _where(
            remap_mixed,
            lambda t: pc.is_valid(t["retired"]),
            ["retired", "final"],
        ).to_pandas()
        remap = _where(
            remap_mixed,
            lambda t: pc.is_null(t["retired"]),
            ["lab", "final"],
        )

        doc_lab = exchange_join(
            compact.select_columns([id_col]),
            labels.map_batches(
                lambda t: t.rename_columns([id_col, "lab"]),
                batch_format="pyarrow",
            ),
            on=id_col,
            how="left",
            num_partitions=cfg.num_partitions,
            post=lambda t: pa.table(
                {
                    id_col: t[id_col].combine_chunks().cast(idt),
                    "lab": pc.coalesce(
                        t["lab"].combine_chunks().cast(idt),
                        t[id_col].combine_chunks().cast(idt),
                    ),
                }
            ),
            empty_schema=pa.schema([(id_col, idt), ("lab", idt)]),
        )

        final = exchange_join(
            doc_lab,
            remap,
            on="lab",
            how="left",
            num_partitions=cfg.num_partitions,
            post=lambda t: pa.table(
                {
                    id_col: t[id_col].combine_chunks().cast(idt),
                    "cluster_id": pc.coalesce(
                        t["final"].combine_chunks().cast(idt),
                        t["lab"].combine_chunks().cast(idt),
                    ),
                }
            ),
            empty_schema=pa.schema(
                [(id_col, idt), ("cluster_id", idt)]
            ),
        ).materialize()

    report["non_singleton_docs"] = _where(
        final,
        lambda t: pc.not_equal(t[id_col], t["cluster_id"]),
        [id_col],
    ).count()
    report["merges"] = len(merges_new)

    if update_index:
        append_index(compact, final, index_root, cfg)
        append_merges(index_root, merges_new)
        report["index_rows"] = load_manifest(index_root)["rows"]

    return final, report
