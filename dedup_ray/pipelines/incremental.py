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
    index_listing,
    append_index,
    append_merges,
    band_bucket,
    load_manifest,
    load_merges,
    read_buckets,
    read_buckets_refs,
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


def _bucket_ids(refs_or_ds, fn) -> list:
    """Distinct bucket ids present in the blocks (≤ num_buckets values per
    block reach the driver — the per-block fn collapses rows to bucket ids
    first).  Runs as a raw task wave + driver set-union rather than a
    ``Dataset.unique`` plan: each of the 5 index tables needs its bucket
    ids before its pruned read, and a full plan launch per table was pure
    fixed latency on a small shard."""
    import ray

    from dedup_ray.util.exchange import map_refs

    def tag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"b": pa.array([], pa.int64())})
        return pa.table(
            {"b": pa.array(np.unique(fn(t)), pa.int64())}
        )

    out: set = set()
    for part in ray.get(map_refs(refs_or_ds, tag)):
        out.update(part["b"].to_pylist())
    return sorted(out)


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
    from dedup_ray.stages.exact import exact_rep_partition
    from dedup_ray.stages.lsh import candidate_pairs
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
    # one filesystem walk shared by every index probe (five tables) —
    # see state/dedupindex.index_listing
    idx_list = index_listing(index_root)

    import os as _os
    import time as _time

    _timing = _os.environ.get("DEDUP_STAGE_TIMING") == "1"
    _t_last = [_time.perf_counter()]

    def _tick(name: str) -> None:
        if _timing:
            now = _time.perf_counter()
            print(f"[inc-timing] {name}: {now - _t_last[0]:.2f}s", flush=True)
            _t_last[0] = now

    compact = compact_signature_table(
        shard_ds, cfg, id_col, extract, with_simhash=False,
        with_chunks=use_sub,
    ).materialize()
    n_docs = compact.count()
    _tick("sign+count")
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
    # raw refs, no materialize barrier: branch task chains start
    # dispatching immediately and resolve the exact exchange lazily
    mixed = exact_rep_partition(
        compact, id_col=id_col, num_partitions=cfg.num_partitions,
        return_refs=True,
    )

    from dedup_ray.util.dsutil import split_mixed_rows
    from dedup_ray.util.exchange import map_refs

    rep_cols = [id_col, "digest", "n_shingles", "sig"] + (
        ["chunks"] if use_sub else []
    )
    import pyarrow.compute as pc

    def _rep_split(t: pa.Table) -> pa.Table:
        if "id1" not in t.column_names:  # void block
            return t
        return t.filter(pc.is_null(t["id1"])).select(rep_cols)

    # shared representative block refs: every branch projects off these
    # with raw tasks instead of launching its own plan over `mixed`
    _tick("exact_partition")
    rep_refs = map_refs(mixed, _rep_split)

    def _edge_split(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t["id1"])).select(["id1", "id2"])

    # r5: the whole edge path stays REF-CHAINED — exact star edges, the
    # digest/cross branch outputs, and the in-shard near edges are raw
    # block-ref lists until the single from_arrow_refs before CC.  Each
    # avoided mid-branch ``.materialize()`` was a full Ray Data plan
    # launch (~0.2-0.3 s of fixed driver latency per call) on a path
    # whose useful work is milliseconds at shard scale.
    exact_e = map_refs(mixed, _edge_split)

    def _sel(cols, rename: dict | None = None):
        def f(t: pa.Table) -> pa.Table:
            if any(c not in t.column_names for c in cols):  # void block
                return t
            out = t.select(cols)
            if rename:
                out = out.rename_columns(
                    [rename.get(c, c) for c in out.column_names]
                )
            return out

        return f

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

    # ---- branch: exact vs index (rep digests ⋈ pruned index digests) ----
    def to_anchor(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id1": t[id_col].combine_chunks().cast(idt),
                "id2": _remap_anchor_col(t["cluster_id"], merges_seen, idt),
            }
        )

    def run_digest():
        dig_refs = map_refs(rep_refs, _sel([id_col, "digest"]))
        idx_dig = read_buckets_refs(
            index_root,
            "digests",
            _bucket_ids(
                dig_refs, lambda t: _bucket_of(t["digest"].to_pylist(), nb)
            ),
            listing=idx_list,
        )
        if idx_dig is None:
            return []
        return exchange_join(
            dig_refs,
            idx_dig,
            on="digest",
            how="inner",
            num_partitions=cfg.num_partitions,
            post=to_anchor,
            empty_schema=anchor_schema,
            return_refs=True,
        )

    # ---- shared band refs: raw-task band explode off the rep refs ------
    from dedup_ray.stages.lsh import BandExploder

    bander = BandExploder(cfg, id_col=id_col)

    def _band_block(t: pa.Table) -> pa.Table:
        if "sig" not in t.column_names:  # void block
            return t
        return bander(t.select([id_col, "sig"]))

    band_refs = map_refs(rep_refs, _band_block)
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

    def _where(ds, mask_fn, cols):
        def f(t: pa.Table) -> pa.Table:
            return t.filter(mask_fn(t)).select(cols)

        return ds.map_batches(f, batch_format="pyarrow")

    # ---- branch: near vs index (bands ⋈ pruned index bands → verify) ----
    def run_cross():
        """Returns (cross_edges materialized, hot_buckets, n_cross)."""
        idx_bands = read_buckets_refs(
            index_root,
            "bands",
            _bucket_ids(
                band_refs, lambda t: band_bucket(t["bhash"].to_numpy(), nb)
            ),
            listing=idx_list,
        )
        if idx_bands is None:
            return [], 0, 0
        cross_mixed = hash_exchange(
            [
                map_refs(
                    band_refs,
                    _sel([id_col, "band", "bhash"], {id_col: "id1"}),
                ),
                map_refs(idx_bands, _sel(["band", "bhash", "id"], {"id": "id2"})),
            ],
            [["band", "bhash"], ["band", "bhash"]],
            cross_reduce,
            num_partitions=cfg.num_partitions,
            return_refs=True,
        )
        cross_pair_refs = map_refs(
            cross_mixed,
            lambda t: t.filter(pc.is_valid(t["id1"])).select(["id1", "id2"]),
        )
        import ray as _ray

        # ONE census wave folds the pair count, the hot-bucket census AND
        # the id2 bucket ids for the sig-read pruning (was two driver
        # waves) — the pair blocks themselves stay remote
        def _census(t: pa.Table) -> pa.Table:
            valid = pc.is_valid(t["id1"]) if t.num_rows else None
            n = (int(pc.sum(pc.cast(valid, pa.int64())).as_py() or 0)
                 if t.num_rows else 0)
            hot = (int(pc.sum(t["hot"]).as_py() or 0) if t.num_rows else 0)
            bks = (sorted(set(_bucket_of(
                t.filter(valid)["id2"].to_pylist(), nb))) if n else [])
            k = max(1, len(bks))
            return pa.table({
                "n": pa.array([n] + [0] * (k - 1), pa.int64()),
                "hot": pa.array([hot] + [0] * (k - 1), pa.int64()),
                "bucket": pa.array(
                    bks + [None] * (k - len(bks)), pa.int64()),
            })

        stats = _ray.get(map_refs(cross_mixed, _census))
        n_cross = int(sum(pc.sum(t["n"]).as_py() or 0 for t in stats))
        hot_buckets = int(sum(pc.sum(t["hot"]).as_py() or 0 for t in stats))
        bucket_ids = sorted(
            {b.as_py() for t in stats for b in t["bucket"] if b.is_valid})
        idx_sigs = read_buckets_refs(
            index_root, "sigs", bucket_ids if n_cross > 0 else [],
            listing=idx_list,
        )
        if idx_sigs is None:
            return [], hot_buckets, n_cross
        # sigs side = shard rep sigs ∪ pruned index sigs, as ONE ref list;
        # both projections map off the RAW index-sig blocks (id, sig,
        # cluster_id) so the cluster side keeps its cluster_id column
        idx_sig_raw = idx_sigs
        side_refs = map_refs(rep_refs, _sel([id_col, "sig"])) + map_refs(
            idx_sig_raw,
            lambda t: pa.table(
                {id_col: t["id"].combine_chunks().cast(idt), "sig": t["sig"]}
            )
            if "id" in t.column_names
            else t,
        )
        accepted = verify_pairs(
            cross_pair_refs, side_refs, cfg, id_col=id_col, id_type=idt,
            return_refs=True,
        )
        cross_edges = exchange_join(
            accepted,
            map_refs(
                idx_sig_raw,
                lambda t: pa.table(
                    {"id2": t["id"], "cluster_id": t["cluster_id"]}
                )
                if "cluster_id" in t.column_names
                else t,
            ),
            on="id2",
            how="inner",
            num_partitions=cfg.num_partitions,
            post=_anchor_post,
            # empty_schema is the POST-output schema (returned directly on
            # void partitions)
            empty_schema=anchor_schema,
            return_refs=True,
        )
        return cross_edges, hot_buckets, n_cross

    # ---- branch: in-shard near edges (same plan as the batch pipeline) --
    def run_in_near():
        cands = candidate_pairs(
            band_refs, cfg, id_col=id_col, global_dedup=False, id_type=idt,
            return_refs=True,
        )
        return verify_pairs(
            cands, rep_refs, cfg, id_col=id_col, id_type=idt,
            return_refs=True,
        )

    # ---- branch: substring/CDC containment path (index chunk tables) ----
    def run_sub():
        """Returns (in_sub_edges, sub_edges, sub_report) — all materialized."""
        from dedup_ray.stages.substring import (
            explode_chunks,
            substring_edges,
            verify_substring_pairs,
        )

        # rep Dataset built only here: the substring path's batch-plan
        # helpers take Datasets, the other three branches stay on refs
        import ray.data as _rds

        reps = split_mixed_rows(
            _rds.from_arrow_refs(mixed), rep_cols, want_edges=False)
        # in-shard containment: the batch plan over shard representatives
        in_sub = substring_edges(reps, cfg, id_col=id_col, id_type=idt)
        in_sub_mat = in_sub.select_columns(["id1", "id2"]).materialize()

        # cross: shard chunk rows ⋈ bucket-pruned index chunk rows
        chunk_rows = explode_chunks(
            reps.select_columns([id_col, "chunks"]), cfg, id_col
        ).materialize()
        idx_chunks = read_buckets_refs(
            index_root,
            "chunks",
            _bucket_ids(
                chunk_rows, lambda t: band_bucket(t["chash"].to_numpy(), nb)
            ),
            listing=idx_list,
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
                    map_refs(chunk_rows, _sel([id_col, "chash"], {id_col: "id1"})),
                    map_refs(idx_chunks, _sel(["chash", "id"], {"id": "id2"})),
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
                sub_pairs,
                lambda t: _bucket_of(t["id2"].to_pylist(), nb),
            )
            if n_sub > 0
            else [],
            listing=idx_list,
        )
        sub_edges_local = _empty_ds(anchor_schema).materialize()
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
            sub_edges_local = exchange_join(
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
        return in_sub_mat, sub_edges_local, {
            "substring_candidates": n_sub,
            "substring_edges": sub_edges_local.count(),
            "hot_chunks_excluded": len(hot_sub),
        }

    # ---- run the four branches CONCURRENTLY: each one's exchange chain
    # carries constant barrier latency independent of CPU count, so
    # overlapping them is a direct fixed-cost cut (same rationale as the
    # batch pipeline's branch overlap)
    from concurrent.futures import ThreadPoolExecutor

    edge_parts = []
    sub_report = {}
    sub_edges = _empty_ds(anchor_schema)
    with ThreadPoolExecutor(max_workers=4) as pool:
        f_dig = pool.submit(run_digest)
        f_cross = pool.submit(run_cross)
        f_near = pool.submit(run_in_near)
        f_sub = pool.submit(run_sub) if use_sub else None
        digest_hits = f_dig.result()
        _tick("branch:digest")
        cross_edges, hot_buckets, n_cross = f_cross.result()
        _tick("branch:cross")
        in_near = f_near.result()
        _tick("branch:in_near")
        edge_parts.append(cross_edges)
        if f_sub is not None:
            in_sub_mat, sub_edges, sub_report = f_sub.result()
            edge_parts.append(in_sub_mat)
            if sub_edges.count() > 0:
                edge_parts.append(sub_edges)

    def _pin_block(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id1": t["id1"].combine_chunks().cast(idt),
                "id2": t["id2"].combine_chunks().cast(idt),
            }
        )

    # one pin wave over every branch's block refs — the edge stream never
    # becomes a Dataset on the (typical) local-CC path: the labels come
    # straight off the pulled blocks, skipping the from_arrow_refs
    # materialize + count + iter_batches plan replays
    import ray.data as _rd

    pinned: list = []
    for part in [exact_e, in_near, digest_hits, *edge_parts]:
        pinned += map_refs(
            part,
            # void partitions (e.g. an empty verify stream) carry their
            # input schema, not (id1, id2) — pin them to the edge schema
            lambda t: _pin_block(t.select(["id1", "id2"]))
            if "id1" in t.column_names and "id2" in t.column_names
            else anchor_schema.empty_table(),
        )
    _tick("edges_union")

    import ray as _ray_mod

    # ONE count wave covers the two report counts and the CC path pick
    # (tiny tagged count tasks, no block pull) — serial per-part waves
    # would pay three driver round-trip barriers on the latency path
    def _count_tab(t: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    w_dig = map_refs(digest_hits, _count_tab)
    w_crs = map_refs(cross_edges, _count_tab)
    w_pin = map_refs(pinned, _count_tab)
    all_counts = _ray_mod.get(w_dig + w_crs + w_pin)

    def _tot(tabs) -> int:
        return int(sum(t["n"][0].as_py() for t in tabs))

    n_dig = _tot(all_counts[: len(w_dig)])
    n_crs_edges = _tot(all_counts[len(w_dig): len(w_dig) + len(w_crs)])
    n_edges = _tot(all_counts[len(w_dig) + len(w_crs):])

    # ---- CC + stable relabel against anchors -----------------------------
    report = {
        "n_docs": n_docs,
        "digest_hits": n_dig,
        "cross_candidates": n_cross,
        "cross_edges": n_crs_edges,
        "hot_buckets_dropped": hot_buckets,
        **sub_report,
    }
    # anchors dedup depends only on the branch refs — submit it BEFORE
    # the (driver-blocking) local CC so its exchange rounds overlap the
    # driver-side union-find
    def _anchor_ids(t: pa.Table) -> pa.Table:
        if "id2" not in t.column_names:  # void block
            return t
        return pa.table({"id": t["id2"].combine_chunks().cast(idt)})

    anchor_src: list = []
    for part in (digest_hits, cross_edges, sub_edges):
        anchor_src += map_refs(part, _anchor_ids)

    anchors = exchange_group_apply(
        anchor_src,
        "id",
        # Arrow-native dedup: from_pandas on an empty frame would infer
        # a null-typed id column, which acero rejects as a join key
        lambda t: t.group_by("id").aggregate([])
        if "id" in t.column_names and t.num_rows
        else pa.schema([("id", idt)]).empty_table(),
        num_partitions=cfg.num_partitions,
        return_refs=True,
    )

    if n_edges == 0:
        labels = None
    elif n_edges <= cfg.cc_local_edge_limit:
        from dedup_ray.stages.cc import connected_components_local_tables

        labels = _rd.from_arrow(
            connected_components_local_tables(_ray_mod.get(pinned)))
    else:
        from dedup_ray.stages.cc import connected_components_distributed

        labels = connected_components_distributed(
            _rd.from_arrow_refs(pinned).materialize())
    _tick("cc")
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
        # entire relabel chain runs REF-CHAINED: the only barriers are the
        # remap materialize (its merge rows must reach the driver) and the
        # final label join
        label_refs = map_refs(
            labels,
            lambda t: pa.table(
                {
                    "id": t["id"].combine_chunks().cast(idt),
                    "lab": t["cluster_id"].combine_chunks().cast(idt),
                }
            ),
        )

        # doc_lab depends only on compact + labels (NOT on the remap) —
        # submit it here so its two exchange rounds overlap the remap
        # barrier below
        doc_lab = exchange_join(
            map_refs(
                compact,
                lambda t: t.select([id_col])
                if id_col in t.column_names
                else t,
            ),
            map_refs(
                label_refs,
                lambda t: t.rename_columns([id_col, "lab"]),
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
            return_refs=True,
        )

        anchor_lab = exchange_join(
            anchors,
            label_refs,
            on="id",
            how="inner",
            num_partitions=cfg.num_partitions,
            empty_schema=pa.schema([("id", idt), ("lab", idt)]),
            return_refs=True,
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
        import ray as _ray

        merge_parts = _ray.get(
            map_refs(
                remap_mixed,
                lambda t: t.filter(pc.is_valid(t["retired"]))
                .select(["retired", "final"]),
            )
        )
        merges_new = pa.concat_tables(
            merge_parts, promote_options="default"
        ).to_pandas()
        remap_refs = map_refs(
            remap_mixed,
            lambda t: t.filter(pc.is_null(t["retired"]))
            .select(["lab", "final"]),
        )

        final = exchange_join(
            doc_lab,
            remap_refs,
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
            return_refs=True,
        )

    import ray as _ray

    # the non-singleton count wave is ALSO the barrier that resolves the
    # final-label refs; the Dataset handed back is then a from_arrow_refs
    # over already-computed blocks (no extra plan execution)
    report["non_singleton_docs"] = int(
        sum(
            t["n"][0].as_py()
            for t in _ray.get(
                map_refs(
                    final,
                    lambda t: pa.table({
                        "n": pa.array(
                            [int(pc.sum(pc.cast(pc.not_equal(
                                t[id_col], t["cluster_id"]), pa.int64()
                            )).as_py() or 0) if t.num_rows else 0],
                            pa.int64(),
                        )
                    }),
                )
            )
        )
    )
    if isinstance(final, list):  # ref list → Dataset for the caller
        final = _rd.from_arrow_refs(final)
    _tick("relabel+final")
    report["merges"] = len(merges_new)

    if update_index:
        append_index(compact, final, index_root, cfg)
        append_merges(index_root, merges_new)
        report["index_rows"] = load_manifest(index_root)["rows"]

    return final, report
