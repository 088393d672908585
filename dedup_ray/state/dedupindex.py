"""Persisted dedup index: dedup NEW shards against a prior run's corpus.

At 100 TB the corpus is not re-deduplicated when a new crawl shard arrives;
the prior run persists a compact index and each new shard is checked against
it touching only the index buckets its own keys hash into.  Layout::

    root/
      manifest.json                    # config_hash, id_col, counts
      digests/bucket=K/part-*.parquet  # (digest, cluster_id)      K = h(digest) % B
      bands/bucket=K/part-*.parquet    # (band, bhash, id)         K = bhash mod B
      sigs/bucket=K/part-*.parquet     # (id, sig, cluster_id)     K = h(id) % B
      merges/part-*.parquet            # (retired, final) cluster renames
      # optional (index built from a with_chunks signature table):
      chunks/bucket=K/part-*.parquet      # (chash, id)            K = chash mod B
      chunkblobs/bucket=K/part-*.parquet  # (id, chunks, cluster_id) K = h(id) % B

Sizes: the base index is ~(16B digest + bands×16B + num_perms×8B sig) per
document — ~1.1 KB/doc at the default config, i.e. ~1% of a 100 KB-page
corpus — and every incremental lookup reads only the buckets present in
the incoming shard (bucket pruning happens on directory names, before any
bytes are read).  The OPTIONAL substring extension is the expensive part:
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

from dedup_ray.config import DedupConfig
from dedup_ray.state.partwrite import _bucket_of

_TABLES = ("digests", "bands", "sigs")


def band_bucket(bhash, num_buckets: int):
    """Nonnegative ``bhash mod B`` (bhash is a signed int64 view of a
    uniform 64-bit hash, so plain mod is already uniform)."""
    return np.mod(np.asarray(bhash, dtype=np.int64), num_buckets).astype(
        np.int64
    )


def _append_bucketed(ds, root: str, bucket_fn, num_buckets: int) -> int:
    """Append ``ds`` rows into ``root/bucket=K/part-<uuid>.parquet``.

    APPEND, not overwrite: incremental updates add part files to existing
    bucket dirs.  Each file is written to a temp name and renamed —
    atomic per part on any local/posix filesystem.
    """
    os.makedirs(root, exist_ok=True)

    def write(part: pd.DataFrame) -> pd.DataFrame:
        if len(part) == 0:
            return pd.DataFrame({"rows": pd.Series(dtype="int64")})
        n = 0
        for bkt, g in part.groupby("__bucket", sort=False):
            d = os.path.join(root, f"bucket={int(bkt):04d}")
            os.makedirs(d, exist_ok=True)
            name = f"part-{uuid.uuid4().hex}.parquet"
            tmp = os.path.join(d, f"_tmp.{name}")
            pq.write_table(
                pa.Table.from_pandas(
                    g.drop(columns="__bucket"), preserve_index=False
                ),
                tmp,
            )
            os.rename(tmp, os.path.join(d, name))
            n += len(g)
        return pd.DataFrame({"rows": [n]})

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column("__bucket", pa.array(bucket_fn(b)))

    from dedup_ray.util.exchange import exchange_group_apply

    # co-locate each bucket's rows so a bucket gets ONE part file per update
    written = exchange_group_apply(
        ds.map_batches(tag, batch_format="pyarrow"),
        "__bucket",
        lambda t: pa.Table.from_pandas(
            write(t.to_pandas()), preserve_index=False
        ),
        num_partitions=min(num_buckets, 32),
    )
    return int(written.to_pandas()["rows"].sum())


def read_buckets(root: str, table: str, bucket_ids):
    """Dataset over ``root/<table>/bucket=K`` for the given K's; None when
    no requested bucket exists (e.g. an empty index)."""
    import ray.data

    dirs = [
        os.path.join(root, table, f"bucket={int(b):04d}")
        for b in sorted(set(int(b) for b in bucket_ids))
    ]
    # expand to files: ray.data.read_parquet treats listed paths as files
    files = [
        os.path.join(d, f)
        for d in dirs
        if os.path.isdir(d)
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    if not files:
        return None
    return ray.data.read_parquet(files)


def load_manifest(root: str) -> dict:
    with open(os.path.join(root, "manifest.json")) as fh:
        return json.load(fh)


def _write_manifest(root: str, m: dict) -> None:
    tmp = os.path.join(root, f"_manifest.{os.getpid()}.json")
    with open(tmp, "w") as fh:
        json.dump(m, fh, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(root, "manifest.json"))


def _labeled_signatures(compact_ds, clusters_ds, cfg: DedupConfig,
                        id_col: str):
    """compact(id, digest, sig[, chunks]) ⋈ clusters(id, cluster_id) — the
    only corpus-sized step of an index write (co-partitioned raw-task
    exchange).  Returns ``(labeled_ds, id_type, has_chunks)``."""
    from dedup_ray.util.exchange import exchange_join

    base = compact_ds.schema().base_schema
    has_chunks = "chunks" in base.names
    cols = [id_col, "digest", "sig"] + (["chunks"] if has_chunks else [])
    compact = compact_ds.select_columns(cols).materialize()
    id_type = compact.schema().base_schema.field(id_col).type

    fields = [
        (id_col, id_type),
        ("digest", pa.string()),
        ("sig", pa.binary(cfg.num_perms * 8)),
    ]
    if has_chunks:
        fields.append(("chunks", pa.binary()))
    fields.append(("cluster_id", id_type))
    labeled = exchange_join(
        compact,
        clusters_ds.select_columns([id_col, "cluster_id"]),
        on=id_col,
        how="left",
        num_partitions=cfg.num_partitions,
        empty_schema=pa.schema(fields),
    ).materialize()
    return labeled, id_type, has_chunks


def _persist_tables(labeled, root: str, cfg: DedupConfig, id_col: str,
                    id_type, num_buckets: int) -> dict:
    """Write the three bucketed index tables from a labeled signature
    Dataset; append semantics.  Returns per-table row counts."""
    from dedup_ray.stages.lsh import band_explode
    from dedup_ray.util.exchange import exchange_group_apply

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

    def digest_rows(part: pa.Table) -> pa.Table:
        # one row per distinct digest (any member's cluster_id — identical
        # texts share a cluster by construction)
        df = part.to_pandas().drop_duplicates(subset=["digest"])
        return pa.Table.from_pandas(
            df[["digest", "cluster_id"]], preserve_index=False
        )

    digests = exchange_group_apply(
        labeled.map_batches(
            lambda t: pa.table(
                {
                    "digest": t["digest"],
                    "cluster_id": sig_rows(t)["cluster_id"],
                }
            ),
            batch_format="pyarrow",
        ),
        "digest",
        digest_rows,
        num_partitions=cfg.num_partitions,
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

    ``chunks`` carries one (chash, id) row per long CDC chunk — the
    candidate-generation side, bucketed by the chunk hash so a shard's
    lookups prune on directory names and per-chash document frequency is
    bucket-locally exact.  ``chunkblobs`` carries each doc's full packed
    chunk sequence plus its cluster id — the verification side, bucketed
    by doc id so only blobs for actual candidate hits are read.
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
    labeled, id_type, has_chunks = _labeled_signatures(
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
        "config_hash": cfg.config_hash(),
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
    if m["config_hash"] != cfg.config_hash():
        raise ValueError(
            "index was built with a different DedupConfig "
            f"({m['config_hash']} != {cfg.config_hash()})"
        )
    labeled, id_type, has_chunks = _labeled_signatures(
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
