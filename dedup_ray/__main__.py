"""CLI entry point — the payload a driver submits via ``ray job submit``.

    ray job submit --working-dir . -- \
        python -m dedup_ray --input /data/pages --output /out/clusters \
            --checkpoint-dir /ckpt/run1 [--no-substring] [--simhash]

Reads a Parquet pages table ``(url, warc_ts, html, text, lang)``, runs the
full dedup pipeline (extract → sign → exact + MinHash/LSH near +
representative-substring edges → connected components), and writes
``clusters(url, cluster_id)`` as partitioned Parquet.  With
``--checkpoint-dir`` every stage persists per-partition lineage + metrics
(see ``dedup_ray.state.manifest``) and a resubmitted job resumes from the
last completed stage.

Continuous-crawl mode: ``--build-index DIR`` persists the bucketed dedup
index after a batch run, and ``--incremental DIR`` clusters a NEW shard
against that index in O(shard) work (``--update-index`` makes the shard
visible to the next one).

This module owns a Ray session ONLY when run as a script (guarded init, per
the embedding contract: library code never calls ``ray.init``).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m dedup_ray")
    ap.add_argument("--input", required=True, help="pages Parquet path/dir")
    ap.add_argument("--output", required=True, help="clusters output dir")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--id-col", default="url")
    ap.add_argument("--no-extract", action="store_true",
                    help="input already has extracted text")
    ap.add_argument("--no-substring", action="store_true")
    ap.add_argument("--simhash", action="store_true")
    ap.add_argument("--shingle-k", type=int, default=None)
    ap.add_argument("--num-perms", type=int, default=None)
    ap.add_argument("--bands", type=int, default=None)
    ap.add_argument("--jaccard-threshold", type=float, default=None)
    ap.add_argument("--num-partitions", type=int, default=None)
    ap.add_argument("--sign-parts", type=int, default=0,
                    help="with --checkpoint-dir: split the input files into "
                    "this many groups and commit the signature stage per "
                    "group, so a killed run re-signs only unfinished groups; "
                    "0 = whole-stage checkpoint")
    ap.add_argument("--output-buckets", type=int, default=0,
                    help="write output via the partition-granular resumable "
                    "sink with this many key-hash buckets (rerun skips "
                    "committed buckets); 0 = plain write_parquet")
    ap.add_argument("--submission-zip", default=None, metavar="PATH",
                    help="also write the cluster assignment as a "
                    "result.json submission zip (reference Makefile:30-32 "
                    "shape) at PATH")
    ap.add_argument("--build-index", default=None, metavar="DIR",
                    help="after the dedup run, persist the bucketed dedup "
                    "index (digests/LSH bands/signatures) at DIR for later "
                    "--incremental runs; reuses the signatures checkpoint "
                    "when --checkpoint-dir is set")
    ap.add_argument("--index-buckets", type=int, default=64,
                    help="bucket count for --build-index (size so one "
                    "bucket is a sane Parquet read; ~64k at 10^11 docs)")
    ap.add_argument("--incremental", default=None, metavar="DIR",
                    help="cluster the input as a NEW shard against the "
                    "index at DIR — O(shard) work, anchors duplicates to "
                    "existing cluster ids — instead of the batch pipeline")
    ap.add_argument("--update-index", action="store_true",
                    help="with --incremental: append the shard's "
                    "signatures and cluster merges to the index so the "
                    "next shard sees this one")
    ap.add_argument("--exact-substring-cut", action="store_true",
                    help="ExactSubstr mode (Lee et al. 2022 semantics): "
                    "remove every char covered by a corpus-duplicated "
                    "substring of >= --min-substring-chars; writes "
                    "(id, text)")
    ap.add_argument("--min-substring-chars", type=int, default=40)
    ap.add_argument("--curate-only", action="store_true",
                    help="run the curation chain (quality screen -> PII "
                    "redaction -> line-level dedup -> reassembly) instead "
                    "of the dedup pipeline; writes curated (id, text)")
    args = ap.parse_args(argv)

    # modes are exclusive and each supports a subset of the shared flags;
    # rejecting bad combinations beats silently ignoring them (a user who
    # passed --submission-zip must not discover at delivery time that no
    # zip was written)
    if args.update_index and not args.incremental:
        ap.error("--update-index requires --incremental")
    if args.incremental and args.curate_only:
        ap.error("--incremental and --curate-only are exclusive modes")
    if args.exact_substring_cut and (args.incremental or args.curate_only):
        ap.error("--exact-substring-cut is an exclusive mode")
    if args.incremental:
        for val, name in (
            (args.build_index, "--build-index"),
            (args.checkpoint_dir, "--checkpoint-dir"),
            (args.sign_parts, "--sign-parts"),
            (args.submission_zip, "--submission-zip"),
        ):
            if val:
                ap.error(f"{name} is not supported with --incremental")
    if args.curate_only:
        for val, name in (
            (args.build_index, "--build-index"),
            (args.sign_parts, "--sign-parts"),
            (args.submission_zip, "--submission-zip"),
        ):
            if val:
                ap.error(f"{name} is not supported with --curate-only")

    import ray

    if not ray.is_initialized():
        ray.init(include_dashboard=False)
    import ray.data

    from dedup_ray.config import DedupConfig
    from dedup_ray.pipelines.dedup import dedup_pipeline

    overrides = {
        k: v
        for k, v in {
            "shingle_k": args.shingle_k,
            "num_perms": args.num_perms,
            "bands": args.bands,
            "jaccard_threshold": args.jaccard_threshold,
            "num_partitions": args.num_partitions,
        }.items()
        if v is not None
    }
    # data-sized exchange partitions unless the user pinned a count —
    # the config default since round 5: auto_partitions=True derives the
    # count from data size whenever num_partitions is left un-pinned
    cfg = DedupConfig(**overrides)

    t0 = time.perf_counter()
    pages = ray.data.read_parquet(args.input)

    if args.exact_substring_cut:
        from dedup_ray.stages.exactsubstr import (
            _dup_set_ref,
            duplicated_grams,
            exact_substring_coverage,
            exact_substring_cut,
        )
        from dedup_ray.stages.extract import extract_pages

        docs = pages if args.no_extract else extract_pages(pages)
        dup_ref = _dup_set_ref(duplicated_grams(
            docs, "text", args.min_substring_chars,
            num_partitions=cfg.num_partitions))  # one gram pass, both uses
        cut = exact_substring_cut(
            docs, id_col=args.id_col, min_len=args.min_substring_chars,
            num_partitions=cfg.num_partitions, dup_ref=dup_ref,
        )
        cut.write_parquet(args.output)
        cov = exact_substring_coverage(
            docs, id_col=args.id_col, min_len=args.min_substring_chars,
            num_partitions=cfg.num_partitions, dup_ref=dup_ref,
        )
        from ray.data.aggregate import Sum

        tot = cov.aggregate(Sum("nchars"), Sum("dup_chars"))
        wall = time.perf_counter() - t0
        print(json.dumps({
            "mode": "exact_substring_cut",
            "docs": ray.data.read_parquet(args.output).count(),
            "total_chars": int(tot["sum(nchars)"]),
            "dup_chars_removed": int(tot["sum(dup_chars)"]),
            "min_substring_chars": args.min_substring_chars,
            "wall_sec": round(wall, 3),
        }))
        return 0

    if args.curate_only:
        from dedup_ray.pipelines.curate import curate_pipeline
        from dedup_ray.stages.extract import extract_pages

        docs = pages if args.no_extract else extract_pages(pages)
        res = curate_pipeline(
            docs, id_col=args.id_col,
            num_partitions=cfg.num_partitions,
            checkpoint_dir=args.checkpoint_dir,
        )
        curated, cctx = res if args.checkpoint_dir else (res, None)
        cur_buckets = {}
        if args.output_buckets:
            from dedup_ray.state.partwrite import resumable_write

            wres = resumable_write(
                curated, args.output, key_col=args.id_col,
                num_buckets=args.output_buckets,
            )
            cur_buckets = {
                "buckets_written": len(wres["written"]),
                "buckets_skipped": len(wres["skipped"]),
            }
        else:
            curated.write_parquet(args.output)
        n = ray.data.read_parquet(args.output).count()
        wall = time.perf_counter() - t0
        print(json.dumps({
            "docs": n, "sec": round(wall, 3),
            "docs_per_sec": round(n / wall, 1),
            "mode": "curate", "output": args.output,
            "resumed_stages": cctx.hits if cctx else [],
            **cur_buckets,
        }))
        ray.shutdown()
        return 0

    if args.incremental:
        from dedup_ray.pipelines.incremental import dedup_against_index

        out, report = dedup_against_index(
            pages,
            args.incremental,
            cfg,
            extract=not args.no_extract,
            update_index=args.update_index,
            # None = follow the index (substring on iff it has chunk tables)
            with_substring=False if args.no_substring else None,
        )
        inc_buckets = {}
        if args.output_buckets:
            from dedup_ray.state.partwrite import resumable_write

            wres = resumable_write(
                out, args.output, key_col=args.id_col,
                num_buckets=args.output_buckets,
            )
            inc_buckets = {
                "buckets_written": len(wres["written"]),
                "buckets_skipped": len(wres["skipped"]),
            }
        else:
            out.write_parquet(args.output)
        wall = time.perf_counter() - t0
        print(json.dumps({
            "mode": "incremental",
            "sec": round(wall, 3),
            "docs_per_sec": round(report["n_docs"] / wall, 1)
            if report["n_docs"] else 0.0,
            "output": args.output,
            **inc_buckets,
            **report,
        }))
        ray.shutdown()
        return 0

    pages_parts = None
    if args.sign_parts and args.checkpoint_dir:
        import os

        files = sorted(
            os.path.join(dp, f)
            for dp, _dns, fns in os.walk(args.input)
            for f in fns
            if f.endswith(".parquet")
        ) or [args.input]
        n = min(args.sign_parts, len(files))
        groups = [files[i::n] for i in range(n)]
        pages_parts = [
            (f"{i:04d}", (lambda g=g: ray.data.read_parquet(g)))
            for i, g in enumerate(groups)
        ]
    clusters, ctx = dedup_pipeline(
        pages,
        cfg,
        id_col=args.id_col,
        extract=not args.no_extract,
        checkpoint_dir=args.checkpoint_dir,
        use_simhash=args.simhash,
        use_substring=not args.no_substring,
        pages_parts=pages_parts,
    )
    buckets = {}
    if args.output_buckets:
        from dedup_ray.state.partwrite import resumable_write

        res = resumable_write(
            clusters, args.output, key_col=args.id_col,
            num_buckets=args.output_buckets,
        )
        buckets = {
            "buckets_written": len(res["written"]),
            "buckets_skipped": len(res["skipped"]),
        }
    else:
        clusters.write_parquet(args.output)
    index = {}
    if args.build_index:
        import os

        from dedup_ray.state.dedupindex import build_index

        sig_data = (
            os.path.join(ctx.stage_dir("signatures"), "data")
            if ctx is not None
            else None
        )
        if sig_data and os.path.isdir(sig_data):
            compact = ray.data.read_parquet(sig_data)
        else:  # no checkpoint to reuse: one extra signing pass
            from dedup_ray.pipelines.dedup import compact_signature_table

            compact = compact_signature_table(
                pages, cfg, args.id_col, extract=not args.no_extract,
                with_simhash=False, with_chunks=not args.no_substring,
            )
        man = build_index(
            compact, ray.data.read_parquet(args.output), args.build_index,
            cfg, id_col=args.id_col, num_buckets=args.index_buckets,
        )
        index = {"index": args.build_index, "index_rows": man["rows"]}
    sub = {}
    if args.submission_zip:
        from dedup_ray.state.submission import write_submission_zip

        sub = {
            "submission": write_submission_zip(
                ray.data.read_parquet(args.output), args.submission_zip,
                id_col=args.id_col, cluster_col="cluster_id",
            )
        }
    n = ray.data.read_parquet(args.output).count()
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "docs": n,
                "sec": round(wall, 3),
                "docs_per_sec": round(n / wall, 1),
                "config_hash": cfg.config_hash(),
                "resumed_stages": ctx.hits if ctx else [],
                "resumed_parts": len(ctx.part_hits) if ctx else 0,
                "output": args.output,
                **buckets,
                **index,
                **sub,
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
