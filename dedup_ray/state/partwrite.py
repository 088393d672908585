"""Partition-granular resumable Parquet output.

`CheckpointContext` resumes at STAGE granularity (make-style, one recipe =
one unit).  For the final 100-TB write that is too coarse: a sink that dies
80% through should rerun only the missing 20%.  This module writes output
bucketed by a key hash — one directory per bucket, atomic rename commit —
and a rerun skips every bucket already committed, re-filtering the INPUT to
only uncommitted buckets before any work is shuffled.

Layout::

    root/
      bucket=0007/part.parquet      # committed (dir rename is the commit)
      _tmp.bucket=0012.<pid>/       # in-flight, ignored + cleaned on resume

Semantics: bucket = ``stable64(key) % num_buckets`` — content-derived, so
the same rows land in the same bucket on every run at any parallelism.
One file per bucket keeps the commit atomic on any filesystem with atomic
rename; size buckets via ``num_buckets`` so each file is a sane Parquet
size (~100 MB-1 GB at scale).
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from dedup_ray.util.hashing import stable64_array


def _bucket_of(keys, num_buckets: int) -> np.ndarray:
    h = stable64_array([str(k) for k in keys], seed=0x9B)
    return (h % np.uint64(num_buckets)).astype(np.int64)


def committed_buckets(root: str) -> set[int]:
    if not os.path.isdir(root):
        return set()
    out = set()
    for name in os.listdir(root):
        if name.startswith("bucket="):
            out.add(int(name.split("=", 1)[1]))
        elif name.startswith("_tmp."):
            shutil.rmtree(os.path.join(root, name), ignore_errors=True)
    return out


def resumable_write(
    ds,
    root: str,
    key_col: str,
    num_buckets: int = 64,
) -> dict:
    """Write ``ds`` bucketed by ``key_col`` hash; skip committed buckets.

    Returns ``{"written": [...], "skipped": [...]}``.  The input is
    filtered to uncommitted buckets BEFORE the bucket shuffle, so a resume
    re-reads the upstream but re-shuffles and re-writes only missing work.
    """
    os.makedirs(root, exist_ok=True)
    done = committed_buckets(root)

    def tag(batch: pa.Table) -> pa.Table:
        b = _bucket_of(batch[key_col].to_pylist(), num_buckets)
        batch = batch.append_column("__bucket", pa.array(b))
        if not done:
            return batch
        keep = ~np.isin(b, list(done))
        return batch.filter(pa.array(keep))

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    def write_bucket(group: pd.DataFrame) -> pd.DataFrame:
        bkt = int(group["__bucket"].iloc[0])
        final = os.path.join(root, f"bucket={bkt:04d}")
        if os.path.exists(final):  # raced by a concurrent writer: skip
            return pd.DataFrame({"bucket": [bkt], "rows": [0]})
        tmp = os.path.join(root, f"_tmp.bucket={bkt:04d}.{os.getpid()}")
        os.makedirs(tmp, exist_ok=True)
        body = group.drop(columns="__bucket").sort_values(
            group.columns.drop("__bucket").tolist(), kind="mergesort"
        )
        pq.write_table(
            pa.Table.from_pandas(body, preserve_index=False),
            os.path.join(tmp, "part.parquet"),
        )
        try:
            os.rename(tmp, final)  # atomic commit
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)  # lost the race: fine
            return pd.DataFrame({"bucket": [bkt], "rows": [0]})
        return pd.DataFrame({"bucket": [bkt], "rows": [len(group)]})

    written = (
        tagged.groupby("__bucket")
        .map_groups(write_bucket, batch_format="pandas")
        .to_pandas()
    )
    return {
        "written": sorted(int(b) for b in written["bucket"]),
        "skipped": sorted(done),
    }


def read_output(root: str):
    """Read a resumable-write output back as one Dataset."""
    import ray.data

    return ray.data.read_parquet(root)
