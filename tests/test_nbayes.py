"""stages/nbayes.py: multinomial NB train + broadcast score."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from dedup_ray.stages.nbayes import nb_score, nb_train


def _corpus():
    rows = []
    for i in range(30):
        rows.append((i, "apfel brot haus " + ("der " * (i % 3)), "de"))
    for i in range(30, 60):
        rows.append((i, "apple bread house " + ("the " * (i % 3)), "en"))
    return pd.DataFrame(rows, columns=["doc_id", "text", "lang"])


def test_nb_separable_corpus_perfect_train_accuracy():
    df = _corpus()
    ds = rd.from_pandas(df)
    model = nb_train(ds, label_col="lang")
    out = nb_score(ds, model, out_col="pred").to_pandas()
    merged = out.merge(df[["doc_id", "lang"]], on="doc_id")
    assert (merged["pred"] == merged["lang"]).all()


def test_nb_model_matches_closed_form():
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a a b", "a b b", "c"],
        "lang": ["x", "x", "y"],
    })
    model = nb_train(rd.from_pandas(df), label_col="lang")
    assert model["classes"] == ["x", "y"]
    assert sorted(model["vocab"]) == ["a", "b", "c"]
    # class x: tokens a=3, b=3, total 6; V=3 -> p(a|x) = 4/9
    va = model["vocab"]["a"]
    assert model["logp"][va, 0] == pytest.approx(np.log(4 / 9))
    # class y: only c, total 1 -> p(a|y) = 1/4
    assert model["logp"][va, 1] == pytest.approx(np.log(1 / 4))
    assert model["logprior"][0] == pytest.approx(np.log(2 / 3))


def test_nb_empty_doc_sentinel_round_trips():
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["hello world", "", "hello hello"],
        "lang": ["en", "de", "en"],
    })
    ds = rd.from_pandas(df)
    model = nb_train(ds, label_col="lang")
    # the sentinel token "2" is in the vocabulary and owned by class de
    assert "2" in model["vocab"]
    out = nb_score(ds, model, out_col="pred").to_pandas()
    assert out[out["doc_id"] == 2]["pred"].iloc[0] == "de"


def test_nb_tie_breaks_to_lexicographically_smallest():
    # perfectly symmetric classes: every doc scores identically under both
    df = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["t t", "t t"],
        "lang": ["b", "a"],
    })
    ds = rd.from_pandas(df)
    model = nb_train(ds, label_col="lang")
    out = nb_score(ds, model, out_col="pred").to_pandas()
    assert (out["pred"] == "a").all()


def test_nb_true_class_prob_sums_consistent():
    import numpy as np

    from dedup_ray.stages.nbayes import nb_score, nb_train, nb_true_class_prob

    df = _corpus()
    ds = rd.from_pandas(df)
    model = nb_train(ds, label_col="lang")
    pt = nb_true_class_prob(ds, model, "lang").to_pandas()
    sc = nb_score(ds, model, with_prob=True,
                  keep_cols=("lang",)).to_pandas()
    m = pt.merge(sc, on="doc_id")
    # perfectly-classified corpus: true class == argmax, so probs agree
    correct = m[m["nb_label"] == m["lang"]]
    assert len(correct) == len(m)
    assert np.allclose(correct["p_true"], correct["nb_prob"], atol=2e-6)
    assert ((pt["p_true"] > 0) & (pt["p_true"] <= 1)).all()


def test_nb_incremental_count_merge_equals_full_retrain():
    import numpy as np
    import pandas as pd

    from dedup_ray.stages.nbayes import (
        nb_count_tables,
        nb_from_counts,
        nb_train,
    )

    df = _corpus()
    shard1, shard2 = df.iloc[:35], df.iloc[35:]
    c1, p1 = nb_count_tables(rd.from_pandas(shard1))
    c2, p2 = nb_count_tables(rd.from_pandas(shard2))
    merged = nb_from_counts(pd.concat([c1, c2], ignore_index=True),
                            pd.concat([p1, p2], ignore_index=True))
    full = nb_train(rd.from_pandas(df))
    assert merged["classes"] == full["classes"]
    assert merged["vocab"] == full["vocab"]
    assert np.array_equal(merged["logp"], full["logp"])
    assert np.array_equal(merged["logprior"], full["logprior"])
