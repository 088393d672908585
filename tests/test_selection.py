"""DSIR importance-weight tests (stages/selection.py)."""

import numpy as np
import pandas as pd
import ray.data as rd

from dedup_ray.stages.selection import DSIR_BUCKETS, dsir_logratio


def test_dsir_scores_target_like_docs_higher(ray_session):
    rng = np.random.default_rng(41)
    wiki_vocab = ["article", "history", "cited", "reference", "notable"]
    spam_vocab = ["buy", "click", "free", "winner", "casino"]
    corpus = pd.DataFrame({
        "doc_id": np.arange(40),
        "text": [" ".join(rng.choice(wiki_vocab, 8)) if i % 2 == 0
                 else " ".join(rng.choice(spam_vocab, 8))
                 for i in range(40)],
    })
    target = pd.DataFrame({
        "doc_id": np.arange(10),
        "text": [" ".join(rng.choice(wiki_vocab, 10)) for _ in range(10)],
    })
    got = dsir_logratio(
        rd.from_pandas(corpus, override_num_blocks=3),
        rd.from_pandas(target),
    ).to_pandas().set_index("doc_id")["llr"]
    wiki_scores = got[[i for i in range(40) if i % 2 == 0]]
    spam_scores = got[[i for i in range(40) if i % 2 == 1]]
    assert wiki_scores.min() > spam_scores.max()


def test_dsir_matches_local_reference(ray_session):
    import hashlib

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(30)]
    corpus = pd.DataFrame({
        "doc_id": np.arange(25),
        "text": [" ".join(rng.choice(vocab, rng.integers(2, 9)))
                 for _ in range(25)],
    })
    target = corpus.iloc[:5]

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:3], 16)

    def hist(df):
        h = np.zeros(DSIR_BUCKETS, np.int64)
        for t in df["text"]:
            for tok in t.split(" "):
                h[bucket(tok)] += 1
        return h

    tgt, raw = hist(target), hist(corpus)
    ratio = (np.log((tgt + 1) / (tgt.sum() + DSIR_BUCKETS))
             - np.log((raw + 1) / (raw.sum() + DSIR_BUCKETS)))
    expected = {
        row.doc_id: round(sum(ratio[bucket(tok)]
                              for tok in row.text.split(" ")), 6)
        for row in corpus.itertuples()
    }
    got = dsir_logratio(
        rd.from_pandas(corpus, override_num_blocks=4),
        rd.from_pandas(target),
    ).to_pandas().set_index("doc_id")["llr"].to_dict()
    assert got.keys() == expected.keys()
    for k in expected:
        assert abs(got[k] - expected[k]) < 1e-9, k


def test_unigram_perplexity_separates_bulk_from_gibberish():
    import pyarrow as pa
    import ray.data as rd

    from dedup_ray.stages.selection import unigram_perplexity

    bulk = ["the quick brown fox jumps"] * 20
    odd = ["zzqx9 vbnmp0 qqqw7 xxkj2 lmzr4"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(21), pa.int64()),
        "text": pa.array(bulk + odd, pa.string()),
    }))
    out = unigram_perplexity(ds).to_pandas().sort_values("doc_id")
    # rare-token doc must score strictly higher perplexity than bulk
    assert out["ppl"].iloc[-1] > out["ppl"].iloc[0]
    assert (out["n_tokens"] == 5).all()
    # nll is the mean: ppl == exp(nll) (3dp)
    import numpy as np

    assert np.allclose(out["ppl"], np.round(np.exp(out["nll"]), 3))


def test_unigram_perplexity_empty_and_null_text():
    import pyarrow as pa
    import ray.data as rd

    from dedup_ray.stages.selection import unigram_perplexity

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["a b", "", None], pa.string()),
    }))
    out = unigram_perplexity(ds).to_pandas().sort_values("doc_id")
    # DSIR convention: empty/null text = one empty-string token
    assert out["n_tokens"].tolist() == [2, 1, 1]
    assert out["ppl"].notna().all()


def test_bigram_backoff_matches_reference(ray_session):
    import math
    from collections import Counter

    import pyarrow as pa
    import ray.data as rd

    from dedup_ray.stages.selection import bigram_backoff_score

    texts = [
        "a b a b c",        # bigrams a-b (x2), b-a, b-c
        "a b x y",          # x-y and b-x are singletons -> backoff
        "a",                # single token: no bigrams
        None,               # null text == empty: no bigrams
        "c a b a b",
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    got = bigram_backoff_score(
        ds, min_count=2, alpha=0.4, num_partitions=3
    ).to_pandas().set_index("doc_id").sort_index()

    # independent reference
    toks = [(t or "").split(" ") for t in texts]
    uni = Counter(w for ws in toks for w in ws)
    total = sum(uni.values())
    big = Counter(
        (ws[i], ws[i + 1]) for ws in toks for i in range(len(ws) - 1))

    def score(ws):
        ss = []
        for i in range(len(ws) - 1):
            c2 = big[(ws[i], ws[i + 1])]
            if c2 >= 2:
                ss.append(math.log(c2 / uni[ws[i]]))
            else:
                ss.append(math.log(0.4 * uni[ws[i + 1]] / total))
        return ss

    for i, ws in enumerate(toks):
        ss = score(ws)
        assert got.loc[i, "n_bigrams"] == len(ss)
        if ss:
            assert abs(got.loc[i, "bigram_lp"] - round(sum(ss) / len(ss), 6)) < 1e-9
        else:
            assert np.isnan(got.loc[i, "bigram_lp"])

    # backoff fired for doc 1 (its singleton bigrams score via unigrams)
    assert got.loc[1, "bigram_lp"] != got.loc[0, "bigram_lp"]


def test_kcenter_select_reference_and_properties(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedup_ray.stages.selection import kcenter_select

    rng = np.random.default_rng(17)
    # three well-separated blobs + noise: the first 3 non-seed picks must
    # come from distinct blobs (farthest-point property)
    blobs = [np.array([0.0, 0.0]), np.array([10.0, 0.0]),
             np.array([0.0, 10.0])]
    pts, blob_of = [], []
    for i in range(30):
        b = i % 3
        pts.append(blobs[b] + rng.normal(0, 0.1, 2))
        blob_of.append(b)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(30), pa.int64()),
        "embedding": pa.array([p.tolist() for p in pts],
                              pa.list_(pa.float64())),
    }))
    got = kcenter_select(ds, k=5).to_pandas()
    assert got["rank"].tolist() == list(range(5))
    assert got["vec_id"].iloc[0] == 0 and got["dist"].iloc[0] == 0.0
    first3 = {blob_of[v] for v in got["vec_id"].iloc[:3]}
    assert first3 == {0, 1, 2}

    # exact greedy reference
    X = np.stack(pts)
    sel = [0]
    dists = [0.0]
    for _ in range(4):
        d = np.sqrt(
            ((X[:, None, :] - X[sel][None, :, :]) ** 2).sum(2)).min(1)
        d[sel] = -1.0
        # max dist, tie smallest id
        best = np.lexsort((np.arange(len(X)), -d))[0]
        sel.append(int(best))
        dists.append(round(float(d[best]), 6))
    assert got["vec_id"].tolist() == sel
    assert got["dist"].tolist() == dists
