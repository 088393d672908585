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

Granularity note: ``run_stage`` checkpoints at stage boundaries (as make
does — one recipe = one unit).  ``run_stage_parts`` goes one level finer for
the expensive streaming stages (the signature pass): the stage's INPUT is
split into named parts, each part's output commits atomically
(``data/part-<id>`` dir rename), and a rerun recomputes only uncommitted
parts — a run that dies 80% through the corpus re-signs only the missing
20%.  ``dedup_ray.state.partwrite`` applies the same idea to the final sink.
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


def _write_parquet_pinned(ds, out_dir: str) -> None:
    """Write ``ds`` to ``out_dir``; pin the schema if it wrote no files.

    An empty dataset writes no part files; writing the schema's empty table
    keeps the checkpoint readable (and unions keep their column types).
    """
    ds.write_parquet(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    if not any(f.endswith(".parquet") for f in os.listdir(out_dir)):
        import pyarrow as pa
        import pyarrow.parquet as pq

        schema = ds.schema()
        arrow_schema = getattr(schema, "base_schema", None) or pa.schema(
            [(n, t) for n, t in zip(schema.names, schema.types)]
        )
        pq.write_table(
            arrow_schema.empty_table(), os.path.join(out_dir, "empty.parquet")
        )


def _part_lineage(data_dir: str) -> list[dict]:
    """Rows + bytes per parquet file straight from footers (no Dataset pass)."""
    import pyarrow.parquet as pq

    parts = []
    for dirpath, _dirnames, filenames in os.walk(data_dir):
        for fname in sorted(filenames):
            if not fname.endswith(".parquet"):
                continue
            fpath = os.path.join(dirpath, fname)
            parts.append(
                {
                    "file": os.path.relpath(fpath, data_dir),
                    "rows": pq.read_metadata(fpath).num_rows,
                    "bytes": os.stat(fpath).st_size,
                }
            )
    return parts


@dataclass
class CheckpointContext:
    """Tracks hits/misses so tests can assert 'completed work not redone'."""

    root: str
    config_hash: str
    hits: list[str] = field(default_factory=list)
    misses: list[str] = field(default_factory=list)
    part_hits: list[str] = field(default_factory=list)
    part_misses: list[str] = field(default_factory=list)

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
        _write_parquet_pinned(ds, tmp_dir)
        wall = time.monotonic() - t0
        if os.path.exists(data_dir):
            import shutil

            shutil.rmtree(data_dir)
        os.rename(tmp_dir, data_dir)
        with _PLAN_LOCK:
            out = ray.data.read_parquet(data_dir)
        # per-partition lineage: a resumed run can skip or re-read any
        # individual part and metrics ride along
        parts = _part_lineage(data_dir)
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

    def run_stage_parts(
        self,
        name: str,
        parts: list[tuple[str, "object"]],
        max_concurrent: int = 4,
    ):
        """Part-granular stage: each input part commits independently.

        ``parts`` is ``[(part_id, fn)]`` where ``fn() -> Dataset`` computes
        that part's slice of the stage.  Layout::

            <root>/<name>/stage.json              # config hash (staleness)
            <root>/<name>/data/part-<id>/         # committed (dir rename)
            <root>/<name>/data/_tmp.part-<id>/    # in-flight, cleaned
            <root>/<name>/manifest.json           # written on completion

        A rerun after a mid-stage death recomputes ONLY uncommitted parts
        (``part_hits``/``part_misses`` record the split).  A config-hash
        mismatch wipes the whole stage, same as ``run_stage``.  Missing
        parts run as concurrent streaming jobs (each is map-only over its
        input slice, so intra-part parallelism already spans the cluster;
        ``max_concurrent`` bounds driver threads, not cluster width).
        """
        import shutil
        from concurrent.futures import ThreadPoolExecutor

        import ray.data

        sdir = self.stage_dir(name)
        data_dir = os.path.join(sdir, "data")
        mpath = os.path.join(sdir, "manifest.json")
        spath = os.path.join(sdir, "stage.json")
        if os.path.exists(mpath):
            with open(mpath) as f:
                if json.load(f).get("config_hash") == self.config_hash:
                    self.hits.append(name)
                    with _PLAN_LOCK:
                        return ray.data.read_parquet(data_dir)
        # stale or partial: wipe on config-hash OR part-layout mismatch
        # (a rerun with a different part split would otherwise read stale
        # committed part dirs alongside the new ones = duplicated rows),
        # keep committed parts only when both match
        part_ids = sorted(pid for pid, _fn in parts)
        stage_meta = None
        if os.path.exists(spath):
            with open(spath) as f:
                stage_meta = json.load(f)
        if stage_meta is not None and (
            stage_meta.get("config_hash") != self.config_hash
            or stage_meta.get("part_ids") != part_ids
        ):
            shutil.rmtree(sdir, ignore_errors=True)
        self.misses.append(name)
        os.makedirs(data_dir, exist_ok=True)
        with open(spath + ".tmp", "w") as f:
            json.dump(
                {
                    "stage": name,
                    "config_hash": self.config_hash,
                    "part_ids": part_ids,
                },
                f,
            )
        os.replace(spath + ".tmp", spath)
        for entry in os.listdir(data_dir):  # in-flight leftovers from a kill
            if entry.startswith("_tmp."):
                shutil.rmtree(os.path.join(data_dir, entry), ignore_errors=True)

        t0 = time.monotonic()

        def run_part(pid: str, fn) -> None:
            final = os.path.join(data_dir, f"part-{pid}")
            if os.path.isdir(final):
                self.part_hits.append(f"{name}/{pid}")
                return
            self.part_misses.append(f"{name}/{pid}")
            tmp = os.path.join(data_dir, f"_tmp.part-{pid}")
            shutil.rmtree(tmp, ignore_errors=True)
            _write_parquet_pinned(fn(), tmp)
            os.rename(tmp, final)  # atomic commit

        with ThreadPoolExecutor(max_workers=max_concurrent) as pool:
            futs = [pool.submit(run_part, pid, fn) for pid, fn in parts]
            for f in futs:
                f.result()  # re-raise the first part failure

        wall = time.monotonic() - t0
        lineage = _part_lineage(data_dir)
        manifest = {
            "stage": name,
            "config_hash": self.config_hash,
            "rows": sum(p["rows"] for p in lineage),
            "wall_sec": round(wall, 3),
            "num_parts": len(parts),
            "parts": lineage,
            "written_at": time.time(),
        }
        with open(mpath + ".tmp", "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(mpath + ".tmp", mpath)
        with _PLAN_LOCK:
            return ray.data.read_parquet(data_dir)


def gc_checkpoints(root: str, keep_config_hashes: set[str] | None = None,
                   max_age_sec: float | None = None,
                   dry_run: bool = False) -> dict:
    """Checkpoint garbage collection — the operational complement of the
    resume story (make's analog: nothing; stale targets accumulate until
    a human deletes them).  A long-lived checkpoint root collects stage
    dirs from superseded configs (every config change writes a fresh
    ``config_hash``, the old tree stays) plus ``*.tmp`` debris from
    killed runs; at 100 TB those are corpus-sized orphans.

    Policy (conservative — never touches data a resume could still use):

    - a stage dir is REMOVABLE when its ``manifest.json``/``stage.json``
      carries a ``config_hash`` outside ``keep_config_hashes`` (when
      given), or its newest manifest timestamp is older than
      ``max_age_sec`` (when given); both conditions when both given;
    - a dir with NO readable metadata at all is debris ONLY if it holds
      no committed parquet (an in-flight ``data.tmp`` / ``_tmp.part-*``
      is always debris);
    - ``dry_run`` reports without deleting.

    Returns ``{"removed": [...], "kept": [...], "bytes_freed": int}`` —
    driver-side filesystem walk, no Ray involvement.
    """
    import shutil

    removed, kept, freed = [], [], 0

    def tree_bytes(p: str) -> int:
        total = 0
        for dirpath, _d, fnames in os.walk(p):
            for f in fnames:
                try:
                    total += os.path.getsize(os.path.join(dirpath, f))
                except OSError:
                    pass
        return total

    def rm(path: str) -> None:
        nonlocal freed
        freed += tree_bytes(path)
        removed.append(path)
        if not dry_run:
            shutil.rmtree(path, ignore_errors=True)

    if not os.path.isdir(root):
        return {"removed": [], "kept": [], "bytes_freed": 0}
    now = time.time()
    for entry in sorted(os.listdir(root)):
        sdir = os.path.join(root, entry)
        if not os.path.isdir(sdir):
            continue
        if entry.endswith(".tmp"):
            rm(sdir)
            continue
        # in-flight debris inside a live stage dir
        data_dir = os.path.join(sdir, "data")
        for sub in ("data.tmp",):
            p = os.path.join(sdir, sub)
            if os.path.isdir(p):
                rm(p)
        if os.path.isdir(data_dir):
            for d in os.listdir(data_dir):
                if d.startswith("_tmp."):
                    rm(os.path.join(data_dir, d))
        meta = None
        for mname in ("manifest.json", "stage.json"):
            mp = os.path.join(sdir, mname)
            if os.path.exists(mp):
                try:
                    with open(mp) as f:
                        meta = json.load(f)
                    break
                except (OSError, json.JSONDecodeError):
                    continue
        if meta is None:
            has_parquet = any(
                f.endswith(".parquet")
                for _dp, _dn, fn in os.walk(sdir) for f in fn
            )
            if has_parquet:
                kept.append(sdir)  # committed data, unknown origin: keep
            else:
                rm(sdir)
            continue
        stale_hash = (
            keep_config_hashes is not None
            and meta.get("config_hash") not in keep_config_hashes
        )
        too_old = (
            max_age_sec is not None
            and now - float(meta.get("written_at", now)) > max_age_sec
        )
        conditions = [c for c, on in (
            (stale_hash, keep_config_hashes is not None),
            (too_old, max_age_sec is not None),
        ) if on]
        if conditions and all(conditions):
            rm(sdir)
        else:
            kept.append(sdir)
    return {"removed": removed, "kept": kept, "bytes_freed": freed}
