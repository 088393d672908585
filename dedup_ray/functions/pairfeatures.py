"""PairFeature protocol + registry — the engine's formal extension surface.

The reference grows by dropping feature scripts into a glob
(``Makefile`` feature targets; ``c_org.py``, ``diff_year.py``,
``doc2vec_pair_native.py`` each append named columns to the pair table —
SURVEY.md §2.12).  The Ray-native formalization: a *pair feature* is a
named, registered callable applied via ``map_batches`` over the keyed pair
table, declaring which input columns it ``requires`` and which it
``provides``; ``apply_pair_features`` composes any subset in one streaming
map (features fuse — no extra pass per feature).

Registering a new feature::

    @register_pair_feature("len_ratio", requires=("n_chars1", "n_chars2"),
                           provides=("len_ratio",))
    def len_ratio(batch: pa.Table, **cfg) -> pa.Table:
        a = batch["n_chars1"].to_numpy(zero_copy_only=False).astype(float)
        b = batch["n_chars2"].to_numpy(zero_copy_only=False).astype(float)
        r = np.minimum(a, b) / np.maximum(np.maximum(a, b), 1.0)
        return batch.append_column("len_ratio", pa.array(np.round(r, 6)))
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Protocol, runtime_checkable

import numpy as np
import pyarrow as pa


@runtime_checkable
class PairFeature(Protocol):
    """A named transform appending feature columns to a pair batch."""

    name: str
    requires: tuple
    provides: tuple

    def __call__(self, batch: pa.Table) -> pa.Table: ...


@dataclass
class _RegisteredFeature:
    name: str
    requires: tuple
    provides: tuple
    fn: Callable
    config: dict = field(default_factory=dict)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.fn(batch, **self.config)


PAIR_FEATURES: dict[str, _RegisteredFeature] = {}


def register_pair_feature(name: str, requires: tuple = (), provides: tuple = ()):
    """Decorator: add ``fn(batch, **config) -> batch`` to the registry."""

    def deco(fn):
        PAIR_FEATURES[name] = _RegisteredFeature(name, tuple(requires),
                                                 tuple(provides), fn)
        return fn

    return deco


def make_feature(name: str, **config) -> _RegisteredFeature:
    """Instantiate a registered feature with config overrides."""
    base = PAIR_FEATURES[name]
    return _RegisteredFeature(base.name, base.requires, base.provides,
                              base.fn, {**base.config, **config})


def apply_pair_features(pairs_ds, features, batch_size: int = 4096):
    """Apply named / instantiated features in ONE fused ``map_batches``.

    ``features``: names from the registry or :class:`_RegisteredFeature`
    instances.  Each feature's ``requires`` is validated against the live
    batch schema (clear error instead of a deep KeyError), and its
    ``provides`` become available to later features in the chain.
    """
    feats = [
        f if isinstance(f, _RegisteredFeature) else make_feature(f)
        for f in features
    ]

    def run(batch: pa.Table) -> pa.Table:
        for f in feats:
            missing = [c for c in f.requires if c not in batch.column_names]
            if missing:
                raise KeyError(
                    f"pair feature {f.name!r} requires columns {missing}; "
                    f"batch has {batch.column_names}"
                )
            batch = f(batch)
        return batch

    return pairs_ds.map_batches(run, batch_format="pyarrow",
                                batch_size=batch_size)


# --- built-in features ------------------------------------------------------


@register_pair_feature("est_jaccard", requires=("sig1", "sig2"),
                       provides=("est_jaccard",))
def _est_jaccard(batch: pa.Table, num_perms: int = 128) -> pa.Table:
    """MinHash signature agreement fraction (the verify stage's scorer)."""
    from dedup_ray.stages.minhash import unpack_signatures

    if batch.num_rows == 0:
        return batch.append_column("est_jaccard", pa.array([], pa.float64()))
    s1 = unpack_signatures(batch["sig1"], num_perms)
    s2 = unpack_signatures(batch["sig2"], num_perms)
    return batch.append_column(
        "est_jaccard", pa.array((s1 == s2).mean(axis=1))
    )


@register_pair_feature("simhash_hamming", requires=("fp1", "fp2"),
                       provides=("hamming",))
def _simhash_hamming(batch: pa.Table) -> pa.Table:
    from dedup_ray.stages.simhash import hamming

    a = batch["fp1"].to_numpy(zero_copy_only=False)
    b = batch["fp2"].to_numpy(zero_copy_only=False)
    return batch.append_column(
        "hamming", pa.array(hamming(a, b).astype(np.int64))
    )


@register_pair_feature("len_ratio", requires=("n_chars1", "n_chars2"),
                       provides=("len_ratio",))
def _len_ratio(batch: pa.Table) -> pa.Table:
    a = batch["n_chars1"].to_numpy(zero_copy_only=False).astype(np.float64)
    b = batch["n_chars2"].to_numpy(zero_copy_only=False).astype(np.float64)
    r = np.minimum(a, b) / np.maximum(np.maximum(a, b), 1.0)
    return batch.append_column("len_ratio", pa.array(np.round(r, 6)))


@register_pair_feature("logistic_score", requires=(), provides=("score", "pred"))
def _logistic_score(batch: pa.Table, model_path: str = "",
                    threshold: float = 0.5) -> pa.Table:
    """Model-artifact scorer as a composable feature (ST4).

    Note: for heavy models prefer the actor-pool stage
    (``stages.classifier.score_with_model``) — this registry variant
    reloads per task and exists for composition in feature chains.
    """
    from dedup_ray.stages.classifier import LogisticScorer

    return LogisticScorer(model_path, threshold)(batch)
