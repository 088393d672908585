"""Persisted dedup index: dedup NEW shards against a prior run's corpus.

At 100 TB the corpus is not re-deduplicated when a new crawl shard arrives;
the prior run persists a compact index and each new shard is checked against
it touching only the index buckets its own keys hash into.  Layout::

    root/
      manifest.json                    # semantic_hash, id_col, counts
      digests/bucket=K/part-*.parquet  # (digest, cluster_id)      K = h(digest) % B
      bands/bucket=K/part-*.parquet    # (band, bhash, id)         K = bhash mod B
      sigs/bucket=K/part-*.parquet     # (id, sig, cluster_id)     K = h(id) % B
      merges/part-*.parquet            # (retired, final) cluster renames
      # optional (index built from a with_chunks signature table):
      chunks/bucket=K/part-*.parquet      # (chash, id)            K = chash mod B
      chunkblobs/bucket=K/part-*.parquet  # (id, chunks, cluster_id) K = h(id) % B

Every table holds one row (set) per DISTINCT TEXT — digest
representatives, not raw docs (see ``_labeled_reps`` for why this is a
recall requirement, not just a size win).  Sizes: the base index is
~(16B digest + bands×16B + num_perms×8B sig) per distinct text —
~1.1 KB at the default config, i.e. ≤1% of a 100 KB-page corpus — and
every incremental lookup reads only the buckets present in the incoming
shard (bucket pruning happens on directory names, before any bytes are
read).  The OPTIONAL substring extension is the expensive part:
CDC chunk fingerprints cost ~12 bytes per ~25-byte chunk, i.e. roughly
half the text bytes again — enable it only when the containment path is
worth that footprint.

Boilerplate document frequency stays EXACT under this layout: all index
rows for a given ``chash`` live in one bucket directory, so a shard that
reads the buckets its own chunk hashes select sees the complete corpus
count for every chunk it shares — df-based hot-chunk exclusion needs no
global census pass.

Bucket functions are content-derived and stable across runs/parallelism
(same convention as ``state/partwrite``), so a shard computes its buckets
locally and reads exactly those index directories.  ``merges`` records
cluster renames caused by later shards bridging two previously separate
clusters; index rows written before a merge keep the retired id, and
readers resolve anchors through the (tiny) merge chain instead of
rewriting corpus-sized bucket files.
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from dedup_ray.config import DedupConfig
from dedup_ray.state.partwrite import _bucket_of

_TABLES = ("digests", "bands", "sigs")


def band_bucket(bhash, num_buckets: int):
    """Nonnegative ``bhash mod B`` (bhash is a signed int64 view of a
    uniform 64-bit hash, so plain mod is already uniform)."""
    return np.mod(np.asarray(bhash, dtype=np.int64), num_buckets).astype(
        np.int64
    )


def _append_bucketed(
    ds, root: str, bucket_fn, num_buckets: int, dedup_subset=None
) -> int:
    """Append ``ds`` rows into ``root/bucket=K/part-<uuid>.parquet``.

    APPEND, not overwrite: incremental updates add part files to existing
    bucket dirs.  Each file is written to a temp name and renamed —
    atomic per part on any local/posix filesystem.  Stays Arrow end to
    end: the corpus-sized sig/chunk payloads must not pay a pandas
    object-boxing round-trip on the index's only corpus-sized write.

    ``dedup_subset``: when set, rows are collapsed to distinct values of
    these columns before writing (Arrow ``group_by``; valid only when the
    subset IS the full output schema).  All rows sharing a bucket key are
    co-located by the exchange, so the dedup is global per build/append.
    """
    os.makedirs(root, exist_ok=True)
    out_schema = pa.schema([("rows", pa.int64())])

    def write(t: pa.Table) -> pa.Table:
        if "__bucket" not in t.column_names or t.num_rows == 0:
            return out_schema.empty_table()
        if dedup_subset:
            t = t.group_by(list(dedup_subset) + ["__bucket"]).aggregate([])
        buckets = t["__bucket"].to_numpy(zero_copy_only=False)
        n = 0
        for bkt in np.unique(buckets):
            g = t.filter(pa.array(buckets == bkt)).drop_columns(["__bucket"])
            d = os.path.join(root, f"bucket={int(bkt):04d}")
            os.makedirs(d, exist_ok=True)
            name = f"part-{uuid.uuid4().hex}.parquet"
            tmp = os.path.join(d, f"_tmp.{name}")
            pq.write_table(g, tmp)
            os.rename(tmp, os.path.join(d, name))
            n += g.num_rows
        return pa.table({"rows": pa.array([n], pa.int64())})

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column("__bucket", pa.array(bucket_fn(b)))

    from dedup_ray.util.exchange import exchange_group_apply

    # co-locate each bucket's rows so a bucket gets ONE part file per update
    written = exchange_group_apply(
        ds.map_batches(tag, batch_format="pyarrow"),
        "__bucket",
        write,
        num_partitions=min(num_buckets, 32),
    )
    df = written.to_pandas()
    return int(df["rows"].sum()) if len(df) else 0


INDEX_TABLES = ("digests", "bands", "sigs", "chunks", "chunkblobs")


def index_listing(root: str, tables=INDEX_TABLES) -> dict:
    """ONE filesystem walk of the index tree →
    ``{table: {bucket_id: [parquet files]}}``.

    An incremental shard probes up to five index tables; without this,
    each probe re-lists its bucket directories — five walks per shard,
    and on an object store each LIST is a round trip.  Walking once per
    ``dedup_against_index`` call (rather than persisting the listing in
    the manifest) keeps the listing trivially fresh across concurrent
    appends/compactions at the same latency win."""
    out: dict = {}
    for tbl in tables:
        td = os.path.join(root, tbl)
        if not os.path.isdir(td):
            continue
        m: dict = {}
        for d in sorted(os.listdir(td)):
            if not d.startswith("bucket="):
                continue
            sub = os.path.join(td, d)
            # same tolerance as the per-probe walk: junk entries (a
            # stray file named bucket=*, a non-numeric suffix) are
            # ignored, never fatal
            if not os.path.isdir(sub):
                continue
            try:
                bkt = int(d.split("=", 1)[1])
            except ValueError:
                continue
            fs = [
                os.path.join(sub, f)
                for f in sorted(os.listdir(sub))
                if f.endswith(".parquet")
            ]
            if fs:
                m[bkt] = fs
        out[tbl] = m
    return out


def _bucket_files(root: str, table: str, bucket_ids, listing=None):
    ids = sorted(set(int(b) for b in bucket_ids))
    if listing is not None:
        tl = listing.get(table, {})
        return [f for b in ids for f in tl.get(b, ())]
    dirs = [os.path.join(root, table, f"bucket={b:04d}") for b in ids]
    return [
        os.path.join(d, f)
        for d in dirs
        if os.path.isdir(d)
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]


def read_buckets(root: str, table: str, bucket_ids, listing=None):
    """Dataset over ``root/<table>/bucket=K`` for the given K's; None when
    no requested bucket exists (e.g. an empty index).  ``listing`` — an
    :func:`index_listing` snapshot to reuse instead of re-walking."""
    import ray.data

    # expand to files: ray.data.read_parquet treats listed paths as files
    files = _bucket_files(root, table, bucket_ids, listing)
    if not files:
        return None
    return ray.data.read_parquet(files)


def read_buckets_refs(root: str, table: str, bucket_ids, listing=None):
    """Block-ref form of :func:`read_buckets`: one RAW read task per part
    file, refs returned immediately — no Ray Data plan launch (a
    ``read_parquet`` execution costs constant driver seconds per call,
    and an incremental shard probes up to five index tables).  ``None``
    when no requested bucket exists."""
    files = _bucket_files(root, table, bucket_ids, listing)
    if not files:
        return None
    return [_read_parquet_file.remote(f) for f in files]


@ray.remote
def _read_parquet_file(path: str):
    return pq.read_table(path)


def load_manifest(root: str) -> dict:
    with open(os.path.join(root, "manifest.json")) as fh:
        return json.load(fh)


def _write_manifest(root: str, m: dict) -> None:
    tmp = os.path.join(root, f"_manifest.{os.getpid()}.json")
    with open(tmp, "w") as fh:
        json.dump(m, fh, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(root, "manifest.json"))


def _labeled_reps(compact_ds, clusters_ds, cfg: DedupConfig, id_col: str):
    """One labeled row per DISTINCT TEXT: digest-representative rows of
    ``compact`` joined to their cluster ids.

    Collapsing byte-identical copies before indexing is load-bearing for
    recall, not just size: k identical docs have identical sigs, so
    per-doc band rows would make every band bucket of a heavily
    syndicated page "hot" (> max_band_group) — and the incremental
    lookup's hot-bucket cap would then drop ALL candidate pairs for
    exactly the most-duplicated content, while its digest path only
    catches exact copies, not near-dups of it.  Rep rows keep bucket
    sizes proportional to content DIVERSITY (the batch pipeline bands
    the same rep set), so the cap only ever fires on true boilerplate.

    Two exchanges, both rep-bounded on the output side: the digest
    rep-partition (wide, one pass — same exchange the batch pipeline
    pays) and a narrow id-keyed label join.  Returns
    ``(labeled_reps_ds, id_type, has_chunks)``.
    """
    from dedup_ray.stages.exact import exact_rep_partition
    from dedup_ray.util.exchange import exchange_join

    base = compact_ds.schema().base_schema
    has_chunks = "chunks" in base.names
    cols = [id_col, "digest", "sig"] + (["chunks"] if has_chunks else [])
    compact = compact_ds.select_columns(cols).materialize()
    id_type = compact.schema().base_schema.field(id_col).type

    mixed = exact_rep_partition(
        compact, id_col=id_col, num_partitions=cfg.num_partitions
    )

    # rep rows cast fixed-size-binary payloads to variable binary
    rep_fields = [(id_col, id_type), ("digest", pa.string()),
                  ("sig", pa.binary())]
    if has_chunks:
        rep_fields.append(("chunks", pa.binary()))
    rep_schema = pa.schema(rep_fields)

    def only_reps(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if "id1" not in t.column_names:  # void exchange partition
            return rep_schema.empty_table()
        return t.filter(pc.is_null(t["id1"])).select(cols)

    reps = mixed.map_batches(only_reps, batch_format="pyarrow")
    labeled = exchange_join(
        reps,
        clusters_ds.select_columns([id_col, "cluster_id"]),
        on=id_col,
        how="left",
        num_partitions=cfg.num_partitions,
        empty_schema=pa.schema(
            list(rep_fields) + [("cluster_id", id_type)]
        ),
    ).materialize()
    return labeled, id_type, has_chunks


def _persist_tables(labeled, root: str, cfg: DedupConfig, id_col: str,
                    id_type, num_buckets: int) -> dict:
    """Write the three bucketed index tables from the labeled
    digest-representative Dataset (one row per distinct text — see
    ``_labeled_reps``); append semantics.  Returns per-table row counts."""
    from dedup_ray.stages.lsh import band_explode

    def sig_rows(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "id": t[id_col],
                "sig": t["sig"],
                "cluster_id": pc.coalesce(
                    t["cluster_id"].combine_chunks().cast(id_type),
                    t[id_col].combine_chunks(),
                ),
            }
        )

    sigs = labeled.map_batches(sig_rows, batch_format="pyarrow")
    n_sigs = _append_bucketed(
        sigs,
        os.path.join(root, "sigs"),
        lambda b: _bucket_of(b["id"].to_pylist(), num_buckets),
        num_buckets,
    )

    # labeled is rep rows: already one row per distinct digest this
    # build/append (across appends a re-crawled text adds one more row per
    # shard — readers drop duplicate pairs, boundedness comes from shards,
    # not copies)
    digests = labeled.map_batches(
        lambda t: pa.table(
            {"digest": t["digest"], "cluster_id": sig_rows(t)["cluster_id"]}
        ),
        batch_format="pyarrow",
    )
    n_digests = _append_bucketed(
        digests,
        os.path.join(root, "digests"),
        lambda b: _bucket_of(b["digest"].to_pylist(), num_buckets),
        num_buckets,
    )

    bands = band_explode(
        labeled.select_columns([id_col, "sig"]), cfg, id_col=id_col
    ).map_batches(
        lambda t: pa.table(
            {"band": t["band"], "bhash": t["bhash"], "id": t[id_col]}
        ),
        batch_format="pyarrow",
    )
    n_bands = _append_bucketed(
        bands,
        os.path.join(root, "bands"),
        lambda b: band_bucket(b["bhash"].to_numpy(), num_buckets),
        num_buckets,
    )
    return {"sigs": n_sigs, "digests": n_digests, "bands": n_bands}


def _persist_chunk_tables(labeled, root: str, cfg: DedupConfig, id_col: str,
                          id_type, num_buckets: int) -> dict:
    """Write the substring-extension tables (append semantics).

    ``chunks`` carries one (chash, id) row per DISTINCT long CDC chunk per
    representative doc — the candidate-generation side, bucketed by the
    chunk hash so a shard's lookups prune on directory names.  Rows are
    deduped on (chash, id) at write (a chunk repeated within one doc is
    one row) and docs are digest representatives (``_labeled_reps``), so
    the per-chash row count a shard sees IS the distinct-text document
    frequency — the df that boilerplate exclusion must measure; raw
    occurrence counts would mark a popular-but-legitimate doc's chunks as
    boilerplate after ~``boilerplate_max_df`` exact copies or within-doc
    repeats.  ``chunkblobs`` carries each rep doc's full packed chunk
    sequence plus its cluster id — the verification side, bucketed by doc
    id so only blobs for actual candidate hits are read (non-rep copies
    are byte-identical, so their blobs would never be read anyway).
    """
    from dedup_ray.stages.substring import explode_chunks

    def sig_rows(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "id": t[id_col],
                "chunks": t["chunks"],
                "cluster_id": pc.coalesce(
                    t["cluster_id"].combine_chunks().cast(id_type),
                    t[id_col].combine_chunks(),
                ),
            }
        )

    n_blobs = _append_bucketed(
        labeled.map_batches(sig_rows, batch_format="pyarrow"),
        os.path.join(root, "chunkblobs"),
        lambda b: _bucket_of(b["id"].to_pylist(), num_buckets),
        num_buckets,
    )

    rows = explode_chunks(
        labeled.select_columns([id_col, "chunks"]), cfg, id_col
    ).map_batches(
        lambda t: pa.table({"chash": t["chash"], "id": t[id_col]}),
        batch_format="pyarrow",
    )
    n_chunks = _append_bucketed(
        rows,
        os.path.join(root, "chunks"),
        lambda b: band_bucket(b["chash"].to_numpy(), num_buckets),
        num_buckets,
        dedup_subset=("chash", "id"),
    )
    return {"chunkblobs": n_blobs, "chunks": n_chunks}


def build_index(
    compact_ds,
    clusters_ds,
    root: str,
    config: DedupConfig | None = None,
    id_col: str = "url",
    num_buckets: int = 64,
) -> dict:
    """Persist the dedup index from a completed run.

    ``compact_ds`` is the run's signature table (id, digest, sig, …) — with
    checkpointing on, ``CheckpointContext.stage_dir('signatures')`` is the
    zero-recompute parquet source.  ``clusters_ds`` is its (id, cluster_id)
    output.  Size ``num_buckets`` so one bucket is a sane Parquet read
    (~64 at test scale, ~64k for a 10^11-doc corpus).
    """
    cfg = config or DedupConfig()
    labeled, id_type, has_chunks = _labeled_reps(
        compact_ds, clusters_ds, cfg, id_col
    )
    rows = _persist_tables(labeled, root, cfg, id_col, id_type, num_buckets)
    if has_chunks:
        rows.update(
            _persist_chunk_tables(
                labeled, root, cfg, id_col, id_type, num_buckets
            )
        )
    m = {
        # semantic_hash, not config_hash: the index outlives any one
        # cluster size, and execution knobs (partitions, concurrency,
        # batch sizes) don't change what a signature means — a reader
        # tuned differently must still be allowed in.
        "semantic_hash": cfg.semantic_hash(),
        "id_col": id_col,
        "id_type": str(id_type),
        "num_buckets": num_buckets,
        "has_chunks": has_chunks,
        "rows": rows,
    }
    _write_manifest(root, m)
    return m


def append_index(
    compact_ds,
    clusters_ds,
    root: str,
    config: DedupConfig | None = None,
) -> dict:
    """Append a new shard's signatures to an existing index.

    ``clusters_ds`` carries the shard's FINAL labels (anchored old cluster
    ids or fresh ones), so later shards anchor consistently.  Config and
    id column come from the manifest; a config-hash mismatch is an error —
    signatures under different knobs are not comparable.
    """
    cfg = config or DedupConfig()
    m = load_manifest(root)
    if m["semantic_hash"] != cfg.semantic_hash():
        raise ValueError(
            "index was built with a different DedupConfig "
            f"({m['semantic_hash']} != {cfg.semantic_hash()})"
        )
    labeled, id_type, has_chunks = _labeled_reps(
        compact_ds, clusters_ds, cfg, m["id_col"]
    )
    if has_chunks != m.get("has_chunks", False):
        raise ValueError(
            "substring extension mismatch: index has_chunks="
            f"{m.get('has_chunks', False)} but shard signatures "
            f"{'carry' if has_chunks else 'lack'} a chunks column"
        )
    rows = _persist_tables(
        labeled, root, cfg, m["id_col"], id_type, m["num_buckets"]
    )
    if has_chunks:
        rows.update(
            _persist_chunk_tables(
                labeled, root, cfg, m["id_col"], id_type, m["num_buckets"]
            )
        )
    m["rows"] = {k: m["rows"][k] + rows[k] for k in rows}
    _write_manifest(root, m)
    return m


def append_merges(root: str, merges: pd.DataFrame) -> None:
    """Record cluster renames ``(retired, final)`` from an incremental run.

    Merge records are append-only and tiny (one row per cluster-pair a new
    shard bridged); corpus-sized bucket files are never rewritten."""
    if len(merges) == 0:
        return
    d = os.path.join(root, "merges")
    os.makedirs(d, exist_ok=True)
    name = f"part-{uuid.uuid4().hex}.parquet"
    tmp = os.path.join(d, f"_tmp.{name}")
    pq.write_table(
        pa.Table.from_pandas(
            merges[["retired", "final"]], preserve_index=False
        ),
        tmp,
    )
    os.rename(tmp, os.path.join(d, name))


def load_merges(root: str) -> dict:
    """All recorded renames as a chain-resolved dict (retired → current).

    Chains arise when a cluster that absorbed others is itself retired by a
    later shard; path compression here means readers do a single dict
    lookup per anchor.  The table is tiny by construction (bounded by the
    number of cluster merges ever performed), so driver-side is fine.
    """
    d = os.path.join(root, "merges")
    if not os.path.isdir(d):
        return {}
    parts = [
        pq.read_table(os.path.join(d, f))
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    if not parts:
        return {}
    df = pa.concat_tables(parts).to_pandas()
    m = dict(zip(df["retired"], df["final"]))
    resolved = {}
    for k in m:
        v, seen = m[k], {k}
        while v in m and v not in seen:
            seen.add(v)
            v = m[v]
        resolved[k] = v
    return resolved


# (table, exact-duplicate drop keys, anchor column to remap) — the keys
# mirror what readers treat as identity, so compaction never changes a
# lookup's result, only the bytes it costs.
_COMPACT_SPEC = (
    ("digests", ("digest", "cluster_id"), "cluster_id"),
    ("bands", ("band", "bhash", "id"), None),
    ("sigs", ("id",), "cluster_id"),
    ("chunks", ("chash", "id"), None),
    ("chunkblobs", ("id",), "cluster_id"),
)


def _compact_bucket_dir(d: str, dedup_keys, anchor_col,
                        merges: dict) -> tuple[int, int, int]:
    """Rewrite one bucket directory: apply the merge renames to its
    anchor column, drop exact-duplicate keyed rows, and coalesce every
    append fragment into ONE part file.  Write-then-rename-then-unlink:
    a crash can only leave EXTRA rows (old parts beside the merged
    one), which the key-dedup of the next compaction run removes — the
    operation is idempotent and per-bucket resumable."""
    from dedup_ray.pipelines.incremental import _remap_anchor_col

    parts = sorted(
        f for f in os.listdir(d)
        if f.endswith(".parquet") and not f.startswith("_tmp")
    )
    if not parts or (len(parts) == 1 and not merges):
        n = pq.read_metadata(os.path.join(d, parts[0])).num_rows \
            if parts else 0
        return (len(parts), n, n)
    t = pa.concat_tables(
        [pq.read_table(os.path.join(d, p)) for p in parts],
        promote_options="default",
    )
    before = t.num_rows
    if anchor_col is not None and merges and anchor_col in t.column_names:
        idx = t.schema.get_field_index(anchor_col)
        idt = t.schema.field(anchor_col).type
        t = t.set_column(
            idx, anchor_col, _remap_anchor_col(t[anchor_col], merges, idt)
        )
    keys = [k for k in dedup_keys if k in t.column_names]
    if keys:
        dup = t.select(keys).to_pandas().duplicated().to_numpy()
        if dup.any():
            t = t.filter(pa.array(~dup))
    name = f"part-{uuid.uuid4().hex}.parquet"
    tmp = os.path.join(d, f"_tmp.{name}")
    pq.write_table(t, tmp)
    os.rename(tmp, os.path.join(d, name))
    for p in parts:
        os.unlink(os.path.join(d, p))
    return (len(parts), before, t.num_rows)


def compact_index(root: str) -> dict:
    """Fold the merge journal into the bucket files and defragment.

    Appends leave two growing costs: every shard adds a part FILE per
    touched bucket (read amplification), and every cluster bridge adds
    a journal row that every future read resolves through
    (``load_merges`` + per-row remap).  Compaction pays both down:
    each bucket directory is rewritten — renames applied, duplicate
    keyed rows dropped, fragments coalesced to one file — and the
    journal is truncated only after every bucket succeeded.

    One Ray task per bucket directory (the journal dict is broadcast
    via ``ray.put`` once); buckets are independent, so the wave scales
    with the cluster and a failed run is simply re-run (idempotent —
    see ``_compact_bucket_dir``).  Readers stay correct mid-compaction:
    bucket rewrites are atomic per file, and resolving an
    already-final anchor through the journal is a no-op.  Single
    writer assumed (same as append), so journal files recorded before
    the wave are exactly the renames the wave applied.
    """
    import ray

    m = load_manifest(root)
    merges = load_merges(root)
    journal_dir = os.path.join(root, "merges")
    journal_parts = (
        sorted(f for f in os.listdir(journal_dir) if f.endswith(".parquet"))
        if os.path.isdir(journal_dir) else []
    )

    merges_ref = ray.put(merges)
    task = ray.remote(
        lambda d, keys, anchor, mg: _compact_bucket_dir(d, keys, anchor, mg)
    )
    futures, stats = [], {}
    for table, keys, anchor in _COMPACT_SPEC:
        tdir = os.path.join(root, table)
        if not os.path.isdir(tdir):
            continue
        for b in sorted(os.listdir(tdir)):
            bd = os.path.join(tdir, b)
            if os.path.isdir(bd):
                futures.append(
                    (table, task.remote(bd, keys, anchor, merges_ref))
                )
    for table, f in futures:
        parts, before, after = ray.get(f)
        s = stats.setdefault(
            table, {"parts": 0, "rows_before": 0, "rows": 0}
        )
        s["parts"] += parts
        s["rows_before"] += before
        s["rows"] += after
    # every bucket rewritten -> the loaded journal rows are applied
    for p in journal_parts:
        os.unlink(os.path.join(journal_dir, p))
    m["rows"] = {
        t: stats.get(t, {}).get("rows", m["rows"].get(t, 0))
        for t in m["rows"]
    }
    m["compactions"] = int(m.get("compactions", 0)) + 1
    _write_manifest(root, m)
    return {
        "merges_applied": len(merges),
        "journal_parts_cleared": len(journal_parts),
        "tables": stats,
    }
