"""Per-stage lineage checkpoints for resumable pipelines.

The reference's resume mechanism is GNU make's file-granularity staleness
check (``Makefile:220-223``: ``.DELETE_ON_ERROR`` + ``.SECONDARY``, SURVEY.md
§4): every stage output is a file; rerunning rebuilds only missing targets.
The Ray-native analog here: every checkpointed stage writes partitioned
Parquet to ``<dir>/<stage>/data`` (atomically: write to ``data.tmp``, rename)
plus a ``manifest.json`` carrying the stage name, the config hash, row count,
wall time and the part-file list.  On rerun, a stage whose manifest matches
the current config hash is *read back* instead of recomputed — the config
hash plays the role of make's mtime staleness check.

Granularity note: this checkpoints at stage boundaries (as make does — one
recipe = one unit), and each stage's Parquet is partitioned, so a restarted
run skips every completed stage and re-streams only the stage that was
in flight when the run died.
"""

from __future__ import annotations

import json
import os
import threading
import time
from dataclasses import dataclass, field

# Ray's parquet path resolution probes `fsspec.implementations.http`, which
# raises (aiohttp absent here).  A clean ModuleNotFoundError is caught by
# Ray, but two checkpointed stages planning CONCURRENTLY (parallel branch
# materialization) can race the import machinery and leave the module
# half-initialized — later imports then raise a bare ImportError Ray does
# NOT catch.  Probe once, single-threaded, at module load.
try:  # pragma: no cover - environment-dependent
    from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
except Exception:
    pass

_PLAN_LOCK = threading.Lock()


@dataclass
class CheckpointContext:
    """Tracks hits/misses so tests can assert 'completed work not redone'."""

    root: str
    config_hash: str
    hits: list[str] = field(default_factory=list)
    misses: list[str] = field(default_factory=list)

    def stage_dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def run_stage(self, name: str, fn, schema_cols: list[str] | None = None):
        """Return the stage's Dataset, from checkpoint when valid.

        ``fn() -> Dataset`` computes the stage; its output is written once
        and read back so downstream stages consume the checkpoint (one
        execution, no lineage recompute).
        """
        import ray.data

        sdir = self.stage_dir(name)
        data_dir = os.path.join(sdir, "data")
        mpath = os.path.join(sdir, "manifest.json")
        if os.path.exists(mpath):
            with open(mpath) as f:
                manifest = json.load(f)
            if manifest.get("config_hash") == self.config_hash:
                self.hits.append(name)
                with _PLAN_LOCK:
                    return ray.data.read_parquet(data_dir)
        self.misses.append(name)
        os.makedirs(sdir, exist_ok=True)
        tmp_dir = data_dir + ".tmp"
        if os.path.exists(tmp_dir):
            import shutil

            shutil.rmtree(tmp_dir)
        t0 = time.monotonic()
        ds = fn()
        ds.write_parquet(tmp_dir)
        wall = time.monotonic() - t0
        # an empty dataset writes no part files; pin the schema so the
        # checkpoint stays readable (and unions keep their column types)
        os.makedirs(tmp_dir, exist_ok=True)
        if not any(f.endswith(".parquet") for f in os.listdir(tmp_dir)):
            import pyarrow as pa
            import pyarrow.parquet as pq

            schema = ds.schema()
            arrow_schema = getattr(schema, "base_schema", None) or pa.schema(
                [(n, t) for n, t in zip(schema.names, schema.types)]
            )
            pq.write_table(
                arrow_schema.empty_table(), os.path.join(tmp_dir, "empty.parquet")
            )
        if os.path.exists(data_dir):
            import shutil

            shutil.rmtree(data_dir)
        os.rename(tmp_dir, data_dir)
        with _PLAN_LOCK:
            out = ray.data.read_parquet(data_dir)
        # per-partition lineage: rows + bytes per part file straight from
        # parquet footers (no extra Dataset pass); a resumed run can skip
        # or re-read any individual part and metrics ride along
        import pyarrow.parquet as pq

        parts = []
        for fname in sorted(os.listdir(data_dir)):
            if not fname.endswith(".parquet"):
                continue
            fpath = os.path.join(data_dir, fname)
            parts.append(
                {
                    "file": fname,
                    "rows": pq.read_metadata(fpath).num_rows,
                    "bytes": os.stat(fpath).st_size,
                }
            )
        manifest = {
            "stage": name,
            "config_hash": self.config_hash,
            "rows": sum(p["rows"] for p in parts),
            "wall_sec": round(wall, 3),
            "parts": parts,
            "written_at": time.time(),
        }
        with open(mpath + ".tmp", "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(mpath + ".tmp", mpath)
        return out
