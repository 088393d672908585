"""Learned pair scorer + persisted model artifact (ST4 + S7).

The reference trains a sklearn/XGB ensemble on pair features and
joblib-dumps the fitted model (``classifier.py:287-423``, artifacts at
``classifier.py:343,373,401``); scorers reload it once per process.  The
Ray-Data-native re-expression:

- :func:`train_logistic` — deterministic full-batch numpy logistic
  regression (no sklearn in the image; the training set for a pair scorer
  is a bounded labeled sample, so driver-side numpy is the honest scale
  shape — the reference trains driver-side too).
- :func:`save_model` / :func:`load_model` — ``.npz`` artifact holding
  weights + standardization + feature names (the joblib-dump analog).
- :class:`LogisticScorer` — actor-pool batch scorer: artifact loaded ONCE
  per actor in ``__init__`` (ST2/ST4 template, SURVEY §2 ST4), vectorized
  ``sigmoid(X·w + b)`` per Arrow batch in ``__call__``.
- :func:`score_with_model` — the ``map_batches(Cls, concurrency=…)``
  stage wiring.

At 100 TB the scoring side streams (one actor pool, model broadcast via
the artifact file / object store); only training collects, and only the
labeled sample.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _sigmoid(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    e = np.exp(z[~pos])
    out[~pos] = e / (1.0 + e)
    return out


def train_logistic(
    X: np.ndarray,
    y: np.ndarray,
    l2: float = 1e-3,
    iters: int = 500,
    lr: float = 0.5,
) -> dict:
    """Deterministic full-batch logistic regression with standardization.

    Plain gradient descent on the L2-regularized log-loss — no RNG, no
    data-order dependence (full-batch), so retraining on the same sample
    reproduces the artifact bit-for-bit.
    """
    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    mean = X.mean(axis=0)
    std = X.std(axis=0)
    std = np.where(std < 1e-12, 1.0, std)
    Xs = (X - mean) / std
    n, d = Xs.shape
    w = np.zeros(d)
    b = 0.0
    for _ in range(iters):
        p = _sigmoid(Xs @ w + b)
        g = p - y
        gw = Xs.T @ g / n + l2 * w
        gb = g.mean()
        w -= lr * gw
        b -= lr * gb
    return {"w": w, "b": np.float64(b), "mean": mean, "std": std}


def save_model(model: dict, path: str, feature_cols: list[str]) -> None:
    """Persist the fitted scorer as an .npz artifact (S7 model sink)."""
    np.savez(
        path,
        w=model["w"],
        b=model["b"],
        mean=model["mean"],
        std=model["std"],
        feature_cols=np.array(feature_cols, dtype=object),
    )


def load_model(path: str) -> tuple[dict, list[str]]:
    """S7 model source: load an .npz artifact saved by :func:`save_model`."""
    z = np.load(path, allow_pickle=True)
    model = {
        "w": z["w"],
        "b": float(z["b"]),
        "mean": z["mean"],
        "std": z["std"],
    }
    return model, [str(c) for c in z["feature_cols"]]


def feature_importance(model: dict, feature_names: list[str]) -> "object":
    """O6 (``classifier.py:345-347``): per-feature importance table.

    For the standardized logistic model, |w_j| is the direct analog of the
    reference's ``feature_importances_`` series (features are z-scored, so
    weight magnitudes are comparable).  Returns a pandas Series indexed by
    feature name, sorted descending — `.to_csv(path)` reproduces the
    reference's export.
    """
    import pandas as pd

    w = np.abs(np.asarray(model["w"], dtype=np.float64))
    if len(feature_names) == 1 and len(w) > 1:  # one vector column
        feature_names = [f"{feature_names[0]}[{i}]" for i in range(len(w))]
    return pd.Series(w, index=feature_names, name="importance").sort_values(
        ascending=False
    )


def predict_proba(model: dict, X: np.ndarray) -> np.ndarray:
    if "stumps" in model:
        return _sigmoid(_stump_margin(model, X))
    Xs = (np.asarray(X, dtype=np.float64) - model["mean"]) / model["std"]
    return _sigmoid(Xs @ model["w"] + model["b"])


def _stump_margin(model: dict, X: np.ndarray) -> np.ndarray:
    X = np.asarray(X, dtype=np.float64)
    F = np.full(len(X), float(model["base"]))
    for j, thr, lv, rv in model["stumps"]:
        F = F + np.where(X[:, int(j)] < thr, lv, rv)
    return F


def train_stumps(
    X: np.ndarray,
    y: np.ndarray,
    n_rounds: int = 24,
    lr: float = 0.5,
    n_thresholds: int = 8,
) -> dict:
    """Deterministic gradient-boosted depth-1 trees on the logistic loss —
    the XGB-shaped second model of the reference's two-model mean ensemble
    (``classifier.py:303-311`` fits an ``XGBClassifier`` next to the
    RandomForest; depth-1 boosting is its honest zero-dependency,
    zero-RNG analog).  Per round: residuals ``r = y − σ(F)``, candidate
    splits = per-feature quantile midpoints, greedy best split by
    variance reduction, leaf values = residual means × ``lr``.  No RNG
    and no data-order dependence, so the fitted stumps are a
    deterministic function of the sample — which is what lets the
    ensemble query pin its oracle as SQL constants.
    """
    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n, d = X.shape
    base = 0.0
    F = np.full(n, base)
    qs = np.linspace(0, 1, n_thresholds + 2)[1:-1]
    cand = np.quantile(X, qs, axis=0)  # (n_thresholds, d)
    stumps: list = []
    for _ in range(n_rounds):
        r = y - _sigmoid(F)
        best = None  # (gain, j, thr, lv, rv)
        for j in range(d):
            xj = X[:, j]
            for thr in np.unique(cand[:, j]):
                left = xj < thr
                nl = int(left.sum())
                if nl == 0 or nl == n:
                    continue
                sl = r[left].sum()
                sr = r.sum() - sl
                gain = sl * sl / nl + sr * sr / (n - nl)
                if best is None or gain > best[0]:
                    best = (gain, j, float(thr), sl / nl, sr / (n - nl))
        if best is None:
            break
        _, j, thr, ml, mr = best
        lv, rv = lr * ml, lr * mr
        F = F + np.where(X[:, j] < thr, lv, rv)
        stumps.append((int(j), float(thr), float(lv), float(rv)))
    return {"stumps": stumps, "base": np.float64(base)}


def save_stump_model(model: dict, path: str, feature_cols: list[str]) -> None:
    """Persist the boosted-stump scorer as an .npz artifact (S7 sink)."""
    s = np.array(model["stumps"], dtype=np.float64).reshape(-1, 4)
    np.savez(
        path,
        stumps=s,
        base=model["base"],
        feature_cols=np.array(feature_cols, dtype=object),
    )


def load_any_model(path: str) -> tuple[dict, list[str]]:
    """Load either artifact kind (logistic .npz or stump .npz) — the
    scorer sniffs the keys, so an ensemble config is just a path list."""
    z = np.load(path, allow_pickle=True)
    cols = [str(c) for c in z["feature_cols"]]
    if "stumps" in z:
        s = z["stumps"]
        return (
            {
                "stumps": [
                    (int(a), float(b), float(c), float(d))
                    for a, b, c, d in s
                ],
                "base": float(z["base"]),
            },
            cols,
        )
    return (
        {"w": z["w"], "b": float(z["b"]), "mean": z["mean"], "std": z["std"]},
        cols,
    )


class LogisticScorer:
    """Actor-pool scorer: artifact loaded once per actor (ST4 template).

    ``feature_cols`` may name scalar columns or ONE list<float> column
    (embedding-style); ``__call__`` appends ``score`` (P(positive)) and
    ``pred`` (score >= threshold) to each Arrow batch.
    """

    def __init__(self, model_path: str, threshold: float = 0.5) -> None:
        self.model, self.feature_cols = load_model(model_path)
        self.threshold = threshold

    def _features(self, batch: pa.Table) -> np.ndarray:
        cols = []
        for c in self.feature_cols:
            col = batch.column(c)
            if (
                pa.types.is_list(col.type)
                or pa.types.is_large_list(col.type)
                or pa.types.is_fixed_size_list(col.type)
            ):
                flat = col.combine_chunks().values.to_numpy(zero_copy_only=False)
                return flat.reshape(len(batch), -1).astype(np.float64)
            if isinstance(col.type, pa.ExtensionType):
                # Ray's ArrowTensorArray (ndarray-per-row columns)
                arr = col.combine_chunks().to_numpy(zero_copy_only=False)
                return np.asarray(arr, dtype=np.float64).reshape(len(batch), -1)
            cols.append(col.to_numpy(zero_copy_only=False).astype(np.float64))
        return np.column_stack(cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        p = predict_proba(self.model, self._features(batch))
        batch = batch.append_column("score", pa.array(np.round(p, 6)))
        return batch.append_column(
            "pred", pa.array((p >= self.threshold).astype(np.int64))
        )


def score_with_model(
    ds,
    model_path: str,
    threshold: float = 0.5,
    concurrency: int = 2,
    batch_size: int = 1024,
):
    """Stream a Dataset through the artifact-backed scorer actor pool."""
    return ds.map_batches(
        LogisticScorer,
        fn_constructor_kwargs={"model_path": model_path, "threshold": threshold},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


class MeanEnsembleScorer(LogisticScorer):
    """ST4, the reference's ensemble semantics verbatim: N fitted models,
    ``preds.mean(axis=1) > 0.5`` (``classifier.py:349-357``, strategy
    ``mean`` is the only one the reference implements).  Every artifact is
    loaded ONCE per actor; each batch is scored by all members and the
    probability mean is thresholded."""

    def __init__(self, model_paths: list[str], threshold: float = 0.5) -> None:
        loaded = [load_any_model(p) for p in model_paths]
        self.models = [m for m, _ in loaded]
        self.feature_cols = loaded[0][1]
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = self._features(batch)
        p = np.mean([predict_proba(m, X) for m in self.models], axis=0)
        batch = batch.append_column("score", pa.array(np.round(p, 6)))
        return batch.append_column(
            "pred", pa.array((p > self.threshold).astype(np.int64))
        )


def score_with_ensemble(
    ds,
    model_paths: list[str],
    threshold: float = 0.5,
    concurrency: int = 2,
    batch_size: int = 1024,
):
    """Stream a Dataset through the mean-ensemble scorer actor pool."""
    return ds.map_batches(
        MeanEnsembleScorer,
        fn_constructor_kwargs={
            "model_paths": model_paths, "threshold": threshold,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


def embedding_pair_features(
    emb_ds,
    len_lookup: dict | None = None,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """ST2 pair features: per block, all pairs' (dist, angle, lenmul).

    Exactly the reference scorer's formulas (``doc2vec_pair_native.py:
    105-110``): ``dist = ‖a−b‖``, ``angle = arccos(clip(cos, −1, 1))``,
    ``lenmul = sqrt(len_a·len_b)`` with per-doc lengths from
    ``len_lookup`` (broadcast small side; falls back to vector norms).
    Vectorized per block: one gather + row-wise norms, no Python pair loop.
    Partitioning assumption: blocks are bounded (label/author blocks).
    """
    import pandas as pd

    import ray

    lookup_ref = ray.put(len_lookup) if len_lookup is not None else None

    def per_block(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(id_col)
        ids = g[id_col].to_numpy()
        V = np.stack(g[vec_col].to_numpy()).astype(np.float64)
        n = len(ids)
        i1, i2 = np.triu_indices(n, 1)
        D = V[i1] - V[i2]
        dist = np.sqrt((D * D).sum(axis=1))
        nrm = np.sqrt((V * V).sum(axis=1))
        dot = (V[i1] * V[i2]).sum(axis=1)
        angle = np.arccos(np.clip(dot / (nrm[i1] * nrm[i2]), -1.0, 1.0))
        if lookup_ref is not None:
            lk = ray.get(lookup_ref)
            lens = np.array([lk.get(i, 1.0) for i in ids], dtype=np.float64)
        else:
            lens = nrm
        lenmul = np.sqrt(lens[i1] * lens[i2])
        return pd.DataFrame(
            {
                block_col: group[block_col].iloc[0],
                "id1": ids[i1],
                "id2": ids[i2],
                "dist": np.round(dist, 6),
                "angle": np.round(angle, 6),
                "lenmul": np.round(lenmul, 6),
            }
        )

    from dedup_ray.util.dsutil import as_arrow

    return as_arrow(
        emb_ds.groupby(block_col).map_groups(per_block, batch_format="pandas")
    )
