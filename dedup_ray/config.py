"""Typed configuration for the dedup engine.

The reference keeps its knobs as implicit Makefile variables
(reference ``Makefile:2-5``); here a single frozen dataclass carries every
semantics-bearing parameter so that (a) runs are reproducible across cluster
sizes and (b) the config hash participates in checkpoint lineage
(see ``dedup_ray.state.manifest``).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass


@dataclass(frozen=True)
class DedupConfig:
    # --- shingling ---------------------------------------------------------
    shingle_k: int = 3  # word shingles of k consecutive tokens
    # --- MinHash / LSH -----------------------------------------------------
    num_perms: int = 128  # MinHash signature length
    bands: int = 32  # LSH bands; rows per band = num_perms // bands
    jaccard_threshold: float = 0.5  # accept edge when est. Jaccard >= this
    verify: str = "signature"  # "none" | "signature"
    # Cap on all-pairs emission within one LSH band bucket.  Buckets larger
    # than this (hot bands: boilerplate shingles) fall back to a sparse
    # star+window emission that preserves connectivity of true dup cliques
    # while bounding cost to O(n) instead of O(n^2).  See lsh.emit_pairs.
    max_band_group: int = 256
    hot_window: int = 2  # window width for the sparse fallback
    # --- SimHash -----------------------------------------------------------
    simhash_bits: int = 64
    simhash_bands: int = 4  # 4 x 16-bit bands => finds all pairs with hamming<=3
    simhash_max_hamming: int = 3
    # --- suffix-array substring dedup -------------------------------------
    min_substring_len: int = 50  # chars; common substring >= this => duplicate
    # Chunks appearing in more than this many docs are boilerplate (cookie
    # banners, templates): excluded from substring candidates and runs.
    # The A1-style global census (groupby(chash).count) finds them.
    # Unit: since the substring path runs on phase-1 representatives, df
    # counts DISTINCT phase-1 clusters, not raw corpus docs — the more
    # robust measure (a 10k-copy dup clique counts once, so real dup
    # content is never misread as boilerplate while true boilerplate still
    # crosses the threshold via distinct-cluster spread).
    boilerplate_max_df: int = 8
    # Containment semantics: a substring pair is a duplicate only when the
    # shared run also covers >= this fraction of the smaller document.
    # Separates true containment (~1.0) from shared boilerplate (~0.3-0.5).
    containment_frac: float = 0.7
    # --- determinism -------------------------------------------------------
    seed: int = 42
    # --- execution ---------------------------------------------------------
    batch_size: int = 1024  # rows per batch for text-heavy stages
    # Batch/bundle size of the fused generate→extract→sign text pass, in
    # rows of ITS INPUT stream.  Small on purpose: when an upstream map is
    # fused in (e.g. a pages generator), this number — counted in upstream
    # rows — sets the task granularity of the whole chain; 64 keeps task
    # count = input block count on real corpora (blocks ≥ 64 rows bundle
    # whole) while preventing tiny-source benches from collapsing to a
    # handful of giant tasks.
    sign_batch_size: int = 64
    minhash_concurrency: int = 4  # actor-pool size for signature stages
    # Hash partitions for joins/shuffles.  ``None`` (the default) means
    # "not pinned": the value normalizes to 16 for direct consumers, and
    # the flagship pipeline re-derives it from data size (see
    # ``auto_partitions``).  Passing an explicit int pins the count and
    # disables the derivation — the library caller's override.
    num_partitions: int | None = None
    # Pinnedness as a real (replace-surviving) field: ``None`` = infer
    # from whether num_partitions was passed; ``dataclasses.replace``
    # carries the computed True/False, so replacing an UNRELATED field
    # on an un-pinned config keeps it un-pinned (deriving from data).
    # One consequence: ``replace(cfg, num_partitions=X)`` on an
    # un-pinned config also carries pinned=False — pass
    # ``partitions_pinned=True`` alongside when the copy must pin.
    partitions_pinned: bool | None = None
    # Size partitions to the DATA, not the CPU count: with
    # ``auto_partitions`` (default True since round 5) the pipeline
    # re-derives an un-pinned num_partitions after the signature stage as
    # ceil(n_docs / docs_per_partition) clamped to [8, 65536].  An
    # exchange moves ~num_partitions² shuffle blocks, so a partition
    # count tuned for 100-TB inputs is pure fixed overhead on a 120k-doc
    # corpus — measured on this box: the flagship's 8→32-CPU leg ran
    # 15.3 s at 32 partitions vs 9.9 s at 8 partitions on identical
    # input (BASELINE.md round 4).
    auto_partitions: bool = True
    docs_per_partition: int = 15_000
    # Driver-side union-find is used when the accepted-edge count is below
    # this; above it the distributed large-star/small-star iteration runs.
    cc_local_edge_limit: int = 2_000_000

    @property
    def rows_per_band(self) -> int:
        return self.num_perms // self.bands

    def config_hash(self) -> str:
        """Stable hash of every semantics-bearing knob, for lineage."""
        payload = json.dumps(asdict(self), sort_keys=True).encode()
        return hashlib.sha256(payload).hexdigest()[:16]

    # Execution-tuning knobs: they change with cluster size and input
    # shape but never change what a digest / signature / band / chunk
    # MEANS.  Artifacts that outlive one process (the persisted dedup
    # index, which a differently-sized cluster must be able to read)
    # key on semantic_hash; same-run checkpoints keep the conservative
    # full config_hash.
    _EXECUTION_KNOBS = (
        "batch_size",
        "sign_batch_size",
        "minhash_concurrency",
        "num_partitions",
        "partitions_pinned",
        "auto_partitions",
        "docs_per_partition",
        "cc_local_edge_limit",
    )

    def semantic_hash(self) -> str:
        """Hash of the signature-semantics knobs only (execution tuning
        excluded), for long-lived artifacts shared across cluster sizes."""
        d = {
            k: v
            for k, v in asdict(self).items()
            if k not in self._EXECUTION_KNOBS
        }
        payload = json.dumps(d, sort_keys=True).encode()
        return hashlib.sha256(payload).hexdigest()[:16]

    @classmethod
    def tuned(cls, threshold: float, num_perms: int = 128,
              fp_weight: float = 0.5, fn_weight: float = 0.5, **kw):
        """Config with (bands, num_perms) chosen by the LSH S-curve
        optimizer (``functions/lshtune.optimal_bands_rows``) for a target
        Jaccard threshold under a permutation budget.  The chosen b·r may
        be below the budget; num_perms is set to exactly b·r so signatures
        carry no dead rows."""
        from dedup_ray.functions.lshtune import optimal_bands_rows

        p = optimal_bands_rows(threshold, num_perms,
                               fp_weight=fp_weight, fn_weight=fn_weight)
        return cls(num_perms=p.num_perms, bands=p.bands,
                   jaccard_threshold=threshold, **kw)

    def __post_init__(self) -> None:
        # Normalize the partition pin: None (un-pinned) becomes the fixed
        # fallback 16 so every direct reader sees an int; pinnedness is
        # inferred from whether the caller passed a count, unless given
        # explicitly — only un-pinned configs are re-derived by
        # ``auto_partitions``.
        if self.partitions_pinned is None:
            object.__setattr__(
                self, "partitions_pinned", self.num_partitions is not None)
        if self.num_partitions is None:
            object.__setattr__(self, "num_partitions", 16)
        if self.num_perms % self.bands != 0:
            raise ValueError("num_perms must be divisible by bands")
        if self.simhash_bits % self.simhash_bands != 0:
            raise ValueError("simhash_bits must be divisible by simhash_bands")
        if self.verify not in ("none", "signature"):
            raise ValueError(f"unknown verify mode {self.verify!r}")
