"""Jaro–Winkler string similarity (Jaro 1989; Winkler 1990) — the
standard record-linkage comparator for short name fields, the graded
companion to the FastSS edit-distance-1 join (``ops/editjoin.py``) and
the natural input to Fellegi–Sunter field agreement
(``ops/linkage.py``: "agrees" = similarity above a cutoff).

Semantics pinned to the published definition (and verified
value-for-value against DuckDB's ``jaro_winkler_similarity`` by test):

- match window ``max(|a|,|b|)//2 − 1`` (min 0), greedy left-to-right
  matching; transpositions = half the mismatched matched positions
- ``jaro = (m/|a| + m/|b| + (m−t)/m) / 3``
- Winkler boost ``jw = j + ℓ·p·(1−j)`` with common prefix ``ℓ ≤ 4``,
  ``p = 0.1``, applied only when ``jaro > 0.7``

Scores are rounded ``floor(x·1e6 + 0.5)/1e6`` so kernel and SQL agree
bit-for-bit regardless of 1-ulp float-association differences.

Scale shape: similarity is computed once per DISTINCT string pair in a
batch (a per-batch cache) — for name tokens the distinct-pair space is
vocabulary-bounded, not corpus-bounded (the same argument as BPE encode
on distinct words, ``stages/bpetrain.py``); the per-pair char loop is
bounded by token length.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

PREFIX_WEIGHT = 0.1
BOOST_THRESHOLD = 0.7
MAX_PREFIX = 4


def jaro(a: str, b: str) -> float:
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        # both-empty is 0.0 too — the rapidfuzz/DuckDB convention
        # (m = 0 ⇒ score 0), diverging from some textbook definitions
        return 0.0
    window = max(max(la, lb) // 2 - 1, 0)
    match_b = [False] * lb
    ma: list[str] = []
    mb_idx: list[int] = []
    for i, ca in enumerate(a):
        lo, hi = max(0, i - window), min(lb, i + window + 1)
        for j in range(lo, hi):
            if not match_b[j] and b[j] == ca:
                match_b[j] = True
                ma.append(ca)
                mb_idx.append(j)
                break
    m = len(ma)
    if m == 0:
        return 0.0
    mb = [b[j] for j in sorted(mb_idx)]
    k = sum(1 for x, y in zip(ma, mb) if x != y)
    t = k // 2  # floor, matching rapidfuzz/DuckDB (odd k rounds down)
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler(a: str, b: str) -> float:
    j = jaro(a, b)
    if j > BOOST_THRESHOLD:
        ell = 0
        for x, y in zip(a[:MAX_PREFIX], b[:MAX_PREFIX]):
            if x != y:
                break
            ell += 1
        j = j + ell * PREFIX_WEIGHT * (1.0 - j)
    return j


def _round6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def jaro_winkler_column(ds, col1: str, col2: str,
                        out_col: str = "jw") -> "object":
    """Append the rounded Jaro–Winkler similarity of two string columns.
    One stateless ``map_batches`` pass; each batch computes every
    DISTINCT (a, b) pair once and scatters scores back."""

    def score(df: pd.DataFrame) -> pd.DataFrame:
        a = df[col1].fillna("").to_numpy()
        b = df[col2].fillna("").to_numpy()
        cache: dict[tuple[str, str], float] = {}
        out = np.empty(len(a), dtype=np.float64)
        for i in range(len(a)):
            key = (a[i], b[i])
            v = cache.get(key)
            if v is None:
                v = _round6(jaro_winkler(*key))
                cache[key] = v
            out[i] = v
        df = df.copy()
        df[out_col] = out
        return df

    return ds.map_batches(score, batch_format="pandas")
