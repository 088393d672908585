"""S8: zip submission sink — cluster assignment → ``result.json`` in a zip.

Reference semantics (``Makefile:30-32,45-47``): link the assignment JSON to
``result.json`` and ``zip -9`` it.  The JSON shape (``lfilter.py:7-12``,
``evaluate.py:40-49``) is ``{block: [[id, id, ...], [id, ...]], ...}`` —
per block, a list of clusters, each a list of member ids.

Scale note: a submission zip is a driver-sized artifact by definition (one
file, human-submitted); the cluster *table* at corpus scale goes through
``state/partwrite.resumable_write`` instead.  What IS distributed here is
the reduction from the (id, cluster_id) table to per-block assignment
lists: one partitioned group-apply emits one JSON fragment per block, and
the driver only concatenates block fragments (O(#blocks) strings, not
O(#ids) Python objects).

Determinism: ids sorted within a cluster, clusters ordered by first id,
blocks sorted; zip entry carries a fixed timestamp so the archive bytes are
reproducible run-to-run (``zip -9`` itself is not; we do better).
"""

from __future__ import annotations

import json
import os
import zipfile

import pandas as pd

# fixed DOS timestamp (zipfile minimum year) → byte-reproducible archives
_EPOCH = (1980, 1, 1, 0, 0, 0)


def _block_fragments(part: pd.DataFrame) -> pd.DataFrame:
    """Per-block ``"block": [[...], ...]`` JSON fragments, deterministically
    ordered.  Runs once per hash partition (each block lands whole in
    exactly one partition) — never on the driver."""
    blocks, frags = [], []
    for block, g in part.groupby("__block", sort=False):
        clusters = [
            sorted(ids.tolist()) for _, ids in g.groupby("__cluster")["__id"]
        ]
        clusters.sort(key=lambda c: c[0])
        blocks.append(str(block))
        frags.append(json.dumps(str(block)) + ": " + json.dumps(clusters))
    return pd.DataFrame({"block": blocks, "frag": frags})


def write_submission_zip(
    clusters_ds,
    path: str,
    id_col: str = "id",
    cluster_col: str = "cluster_id",
    block_col: str | None = None,
    arcname: str = "result.json",
) -> dict:
    """Write ``clusters_ds`` (id, cluster_id[, block]) as a submission zip.

    Returns ``{"blocks": n, "ids": n, "bytes": archive_size}``.  With no
    ``block_col`` every row belongs to one implicit block ``"all"``.
    """
    from dedup_ray.util.dsutil import partitioned_group_apply

    def project(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"__id": b[id_col], "__cluster": b[cluster_col]}
        )
        out["__block"] = b[block_col] if block_col is not None else "all"
        return out

    ds = clusters_ds.map_batches(project, batch_format="pandas")
    frags = partitioned_group_apply(ds, ["__block"], _block_fragments)
    fdf = frags.to_pandas().sort_values("block")

    body = "{" + ", ".join(fdf["frag"]) + "}"
    # parse-validate before shipping: malformed fragments must fail HERE
    parsed = json.loads(body)
    n_ids = sum(len(c) for cl in parsed.values() for c in cl)

    tmp = f"{path}._tmp.{os.getpid()}"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED, compresslevel=9) as zf:
        info = zipfile.ZipInfo(arcname, date_time=_EPOCH)
        info.compress_type = zipfile.ZIP_DEFLATED
        zf.writestr(info, body)
    os.replace(tmp, path)
    return {
        "blocks": len(fdf),
        "ids": n_ids,
        "bytes": os.path.getsize(path),
    }


def read_submission_zip(path: str, arcname: str = "result.json") -> dict:
    """Inverse of :func:`write_submission_zip` (the ``evaluate.py:40-41``
    consumer shape): returns the parsed assignment dict."""
    with zipfile.ZipFile(path) as zf:
        with zf.open(arcname) as fh:
            return json.load(fh)
