"""Learned pair scorer (ST4) + model artifact (S7): trainer correctness,
artifact roundtrip, actor-pool scoring parity, pair-feature formulas."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from dedup_ray.stages.classifier import (
    LogisticScorer,
    embedding_pair_features,
    load_model,
    predict_proba,
    save_model,
    score_with_model,
    train_logistic,
)


def _planted(n=400, d=8, seed=7):
    rng = np.random.RandomState(seed)
    y = (np.arange(n) % 2).astype(np.float64)
    X = rng.randn(n, d)
    X[:, 0] += 3.0 * (2 * y - 1)  # separable along dim 0
    return X, y


def test_trainer_learns_planted_separation():
    X, y = _planted()
    model = train_logistic(X, y)
    acc = ((predict_proba(model, X) >= 0.5) == y).mean()
    assert acc >= 0.95
    # deterministic: retrain reproduces the weights bit-for-bit
    model2 = train_logistic(X, y)
    assert np.array_equal(model["w"], model2["w"])


def test_artifact_roundtrip(tmp_path):
    X, y = _planted(n=100)
    model = train_logistic(X, y, iters=50)
    path = str(tmp_path / "m.npz")
    save_model(model, path, [f"f{i}" for i in range(X.shape[1])])
    loaded, cols = load_model(path)
    assert cols == [f"f{i}" for i in range(X.shape[1])]
    assert np.array_equal(predict_proba(model, X), predict_proba(loaded, X))


def test_actor_pool_scoring_matches_driver(tmp_path):
    X, y = _planted(n=200, d=4)
    model = train_logistic(X, y, iters=100)
    path = str(tmp_path / "m.npz")
    save_model(model, path, ["f0", "f1", "f2", "f3"])
    df = pd.DataFrame(X, columns=["f0", "f1", "f2", "f3"])
    df["rid"] = np.arange(len(df))
    out = (
        score_with_model(rd.from_pandas(df), path, concurrency=2, batch_size=32)
        .to_pandas()
        .sort_values("rid")
    )
    expect = np.round(predict_proba(model, X), 6)
    assert np.allclose(out["score"].to_numpy(), expect)
    assert (out["pred"].to_numpy() == (expect >= 0.5).astype(int)).all()


def test_scorer_list_column(tmp_path):
    """Embedding-style list<float> feature column path."""
    X, y = _planted(n=60, d=6)
    model = train_logistic(X, y, iters=100)
    path = str(tmp_path / "m.npz")
    save_model(model, path, ["embedding"])
    df = pd.DataFrame({"rid": np.arange(len(X)), "embedding": list(X)})
    out = (
        score_with_model(rd.from_pandas(df), path, concurrency=1, batch_size=16)
        .to_pandas()
        .sort_values("rid")
    )
    assert np.allclose(out["score"].to_numpy(), np.round(predict_proba(model, X), 6))


def test_pair_features_match_reference_formulas():
    """dist/angle/lenmul == doc2vec_pair_native.py:105-110 brute force."""
    rng = np.random.RandomState(3)
    V = rng.randn(5, 4)
    lens = {i: float(10 + i) for i in range(5)}
    df = pd.DataFrame(
        {"vec_id": range(5), "label": ["a"] * 5, "embedding": list(V)}
    )
    out = (
        embedding_pair_features(rd.from_pandas(df), len_lookup=lens)
        .to_pandas()
        .set_index(["id1", "id2"])
    )
    assert len(out) == 10
    for i in range(5):
        for j in range(i + 1, 5):
            a, b = V[i], V[j]
            dist = np.linalg.norm(a - b)
            cos = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
            angle = np.arccos(max(min(cos, 1.0), -1.0))
            lenmul = np.sqrt(lens[i] * lens[j])
            row = out.loc[(i, j)]
            assert row["dist"] == pytest.approx(dist, abs=1e-6)
            assert row["angle"] == pytest.approx(angle, abs=1e-6)
            assert row["lenmul"] == pytest.approx(lenmul, abs=1e-6)


def test_feature_importance_export(tmp_path):
    """O6: separable dim dominates; CSV export round-trips."""
    from dedup_ray.stages.classifier import feature_importance

    X, y = _planted(n=300, d=6)
    model = train_logistic(X, y)
    imp = feature_importance(model, [f"f{i}" for i in range(6)])
    assert imp.index[0] == "f0"  # the planted separable dimension
    path = tmp_path / "imp.csv"
    imp.to_csv(path)
    assert path.read_text().splitlines()[1].startswith("f0,")

    vec = feature_importance(model, ["embedding"])
    assert list(vec.index)[0].startswith("embedding[")


def test_stump_trainer_separates_and_is_deterministic():
    from dedup_ray.stages.classifier import predict_proba, train_stumps

    X, y = _planted(n=300, d=6)
    m1 = train_stumps(X, y)
    m2 = train_stumps(X, y)
    assert m1["stumps"] == m2["stumps"]  # zero-RNG: bit-identical refits
    p = predict_proba(m1, X)
    acc = ((p > 0.5) == (y > 0.5)).mean()
    assert acc > 0.9  # planted separable dimension is learnable by stumps


def test_mean_ensemble_matches_reference_semantics(ray_session, tmp_path):
    """classifier.py:349-357: preds.mean(axis=1) > 0.5, strategy 'mean'."""
    import ray.data as rd

    from dedup_ray.stages.classifier import (
        load_any_model,
        predict_proba,
        save_model,
        save_stump_model,
        score_with_ensemble,
        train_logistic,
        train_stumps,
    )

    X, y = _planted(n=200, d=4)
    p_log = str(tmp_path / "log.npz")
    p_stu = str(tmp_path / "stu.npz")
    save_model(train_logistic(X, y), p_log, ["embedding"])
    save_stump_model(train_stumps(X, y), p_stu, ["embedding"])

    import pyarrow as pa

    tbl = pa.table({
        "vec_id": pa.array(range(len(X)), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in X],
                              pa.list_(pa.float64())),
    })
    out = (
        score_with_ensemble(rd.from_arrow(tbl), [p_log, p_stu], concurrency=1)
        .to_pandas().sort_values("vec_id")
    )
    m_log, _ = load_any_model(p_log)
    m_stu, _ = load_any_model(p_stu)
    mean_p = np.mean(
        [predict_proba(m_log, X), predict_proba(m_stu, X)], axis=0
    )
    assert np.allclose(out["score"].to_numpy(), np.round(mean_p, 6))
    assert np.array_equal(
        out["pred"].to_numpy(), (mean_p > 0.5).astype(np.int64)
    )
    # ensemble accuracy at least matches the planted labels
    assert ((mean_p > 0.5) == (y > 0.5)).mean() > 0.9
