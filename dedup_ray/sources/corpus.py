"""Corpus readers: one entry point over Parquet / JSONL / CSV (S1 + S3).

The reference ingests JSON dumps (``load.py`` reads the pubs JSON into
per-name records) and passes CSV files between Make stages; this module is
the Ray-Data-native equivalent: ``read_corpus`` dispatches to the matching
``ray.data.read_*`` reader and applies column pruning as close to the scan
as each format allows (Parquet prunes at the reader — columns never leave
storage; JSONL/CSV must parse the row first, so pruning happens in the
first map over each block).

Scale notes: all three readers stream file-by-file (no driver
materialization); Parquet is the preferred interchange format and the only
one with real projection/row-group pushdown, which is why every internal
checkpoint/sink in this engine writes Parquet — JSONL/CSV support exists
for INGEST of external corpora, matching the reference's boundary.
"""

from __future__ import annotations

import os

import ray.data

_EXT_FORMAT = {
    ".parquet": "parquet",
    ".pq": "parquet",
    ".json": "json",
    ".jsonl": "json",
    ".ndjson": "json",
    ".csv": "csv",
}


def infer_format(path: str) -> str:
    """File extension → format; directories use their first data file."""
    p = path.rstrip("/")
    ext = os.path.splitext(p)[1].lower()
    if not ext and os.path.isdir(p):
        for dirpath, _dns, fnames in sorted(os.walk(p)):
            for f in sorted(fnames):
                e = os.path.splitext(f)[1].lower()
                if e in _EXT_FORMAT:
                    return _EXT_FORMAT[e]
    if ext in _EXT_FORMAT:
        return _EXT_FORMAT[ext]
    raise ValueError(f"cannot infer corpus format from {path!r}")


def read_corpus(
    path: str,
    format: str | None = None,
    columns: list[str] | None = None,
):
    """path → Dataset, format-dispatched, column-pruned.

    ``format`` in {"parquet", "json", "csv"}; inferred from the extension
    when omitted.  JSON means JSON-Lines (one record per line — the only
    JSON layout that splits for parallel reads; the reference's
    one-big-JSON dump is converted on ingest, same as its ``load.py`` does
    driver-side once).
    """
    fmt = format or infer_format(path)
    if fmt == "parquet":
        return ray.data.read_parquet(path, columns=columns)
    if fmt == "json":
        ds = ray.data.read_json(path)
    elif fmt == "csv":
        ds = ray.data.read_csv(path)
    else:
        raise ValueError(f"unsupported corpus format {fmt!r}")
    if columns:
        ds = ds.select_columns(columns)
    return ds
