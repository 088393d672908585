"""Pareto-front (skyline) filter: keep the non-dominated rows.

Multi-objective selection shows up in corpus curation as "keep every
document no other document beats on ALL quality axes at once" — e.g.
maximal vocabulary at minimal length, quality-vs-toxicity trade-offs.
Row ``a`` dominates ``b`` when ``a`` is at least as good on every axis
and strictly better on at least one.

Scale story (why this streams): the local prune is a true combiner —
a row dominated inside any SUBSET is dominated in the full set, and a
global survivor survives in every subset containing it, so
``front(union) == front(union of per-batch fronts)``.  Each batch
therefore forwards only its own front (for 2-D axes the expected front
of n random points is O(log n) rows), and a single reduce task runs
the identical staircase over the concatenated fronts.  No all-to-all:
one map wave plus one single-partition gather of already-tiny fronts.

The two comparison axes are integer-valued in the shipped queries so
the dominance test is exact (no float rounding hazard between the
Arrow kernel and the SQL oracle's ``NOT EXISTS`` formulation).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_I64_MIN = np.iinfo(np.int64).min


def _staircase_keep(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the maxima set (maximize BOTH axes).

    Classic 2-D staircase: sort by (x desc, y desc); a distinct point
    survives iff its y strictly exceeds the running max of y over all
    earlier points.  Duplicate (x, y) rows are adjacent in the sort
    order and inherit their run head's verdict, so every copy of a
    front point is kept (dominance is defined with a strict '>' on at
    least one axis — equal points never dominate each other).
    """
    n = len(x)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((-y, -x))
    xs, ys = x[order], y[order]
    # exclusive running max of y (sentinel at the head keeps row 0)
    prev_max = np.empty(n, dtype=np.int64)
    prev_max[0] = _I64_MIN
    np.maximum.accumulate(ys[:-1], out=prev_max[1:])
    head_keep = ys > prev_max
    # propagate each duplicate-run head's verdict across its run
    new_run = np.empty(n, dtype=bool)
    new_run[0] = True
    new_run[1:] = (xs[1:] != xs[:-1]) | (ys[1:] != ys[:-1])
    run_id = np.cumsum(new_run) - 1
    keep_sorted = head_keep[new_run][run_id]
    mask = np.zeros(n, dtype=bool)
    mask[order] = keep_sorted
    return mask


def _axes(t: pa.Table, x_col: str, y_col: str, maximize) -> tuple:
    x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    if not maximize[0]:
        x = -x
    if not maximize[1]:
        y = -y
    return x, y


def pareto_front(
    ds,
    x_col: str,
    y_col: str,
    maximize: tuple = (True, True),
):
    """Rows of ``ds`` on the 2-D Pareto front of (x_col, y_col).

    ``maximize[i]`` False flips axis i to "smaller is better".  All
    other columns ride along unchanged.  Axes must be integral (cast
    to int64 for the comparison).  The gather is ONE partition by
    construction — the front is a global property, and the per-batch
    combiner has already shrunk the stream to O(front) rows.
    """
    from dedup_ray.util.exchange import hash_exchange

    def prune(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        x, y = _axes(t, x_col, y_col, maximize)
        return t.filter(pa.array(_staircase_keep(x, y)))

    local = ds.map_batches(prune, batch_format="pyarrow")
    return hash_exchange([local], [x_col], prune, num_partitions=1)
