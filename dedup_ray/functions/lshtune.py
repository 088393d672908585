"""MinHash-LSH band/row tuning: the S-curve and its optimal-parameter search.

Public theory (Leskovec/Rajaraman/Ullman, *Mining of Massive Datasets*
ch. 3; the same search datasketch ships as ``_optimal_param``): with ``b``
bands of ``r`` rows, a pair at true Jaccard ``s`` collides in at least one
band with probability ``P(s) = 1 − (1 − s^r)^b``, an S-curve whose midpoint
sits near ``(1/b)^(1/r)``.  Given a target threshold, the best (b, r)
minimizes the weighted sum of

- false-positive mass:  ∫₀^t P(s) ds   (candidates the verifier must reject)
- false-negative mass:  ∫_t^1 (1 − P(s)) ds   (true pairs never proposed)

Used advisorily: ``DedupConfig(bands=…, num_perms=…)`` stays the explicit
contract (band count is part of the lineage hash), and this module answers
"what should those be for τ and a perm budget" plus "what does my current
config actually guarantee".
"""

from __future__ import annotations

from dataclasses import dataclass


def collision_probability(s: float, b: int, r: int) -> float:
    """P(candidate | true Jaccard s) under b bands × r rows."""
    return 1.0 - (1.0 - s**r) ** b


def curve_threshold(b: int, r: int) -> float:
    """Approximate S-curve midpoint (1/b)^(1/r)."""
    return (1.0 / b) ** (1.0 / r)


def _error_masses(threshold: float, b: int, r: int, steps: int = 200
                  ) -> tuple[float, float]:
    """(false-positive, false-negative) probability mass via midpoint rule."""
    fp = 0.0
    w = threshold / steps
    for i in range(steps):
        fp += collision_probability((i + 0.5) * w, b, r) * w
    fn = 0.0
    w = (1.0 - threshold) / steps
    for i in range(steps):
        s = threshold + (i + 0.5) * w
        fn += (1.0 - collision_probability(s, b, r)) * w
    return fp, fn


@dataclass(frozen=True)
class LshParams:
    bands: int
    rows: int
    fp_mass: float
    fn_mass: float

    @property
    def num_perms(self) -> int:
        return self.bands * self.rows


def optimal_bands_rows(
    threshold: float,
    num_perms: int = 128,
    fp_weight: float = 0.5,
    fn_weight: float = 0.5,
) -> LshParams:
    """Search every (b, r) with b·r ≤ num_perms for the minimum weighted
    error mass.  Exhaustive: the space is O(num_perms·divisors), trivial.
    Deterministic tie-break: larger b·r (use the budget), then smaller b.
    """
    if not 0.0 < threshold < 1.0:
        raise ValueError("threshold must be in (0, 1)")
    best: tuple | None = None
    for b in range(1, num_perms + 1):
        max_r = num_perms // b
        for r in range(1, max_r + 1):
            fp, fn = _error_masses(threshold, b, r)
            key = (fp_weight * fp + fn_weight * fn, -(b * r), b)
            if best is None or key < best[0]:
                best = (key, LshParams(b, r, fp, fn))
    return best[1]


def config_recall_at(threshold: float, bands: int, rows: int) -> float:
    """Collision probability exactly AT the acceptance threshold — a quick
    'what fraction of borderline pairs does banding even propose' readout."""
    return collision_probability(threshold, bands, rows)
