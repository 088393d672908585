"""LSH+verify operating curve: near-path recall as a function of TRUE
shingle Jaccard.

The north-rule criterion (dup-pair recall ≥ 0.99 at the fixed
shingle/signature config) holds for pairs the config is designed to catch.
With 32 bands × 4 rows and a 0.5 estimated-Jaccard accept threshold the
theoretical miss probability at true J is
``(1 - J^4)^32 + P(est < 0.5 | J)``; at J ≥ 0.7 that is < 0.2%.  This test
measures the whole near path (shingle → sign → band → candidates → verify)
on pairs with controlled true Jaccard and asserts the curve's high-J end.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from dedup_ray.config import DedupConfig
from dedup_ray.stages.lsh import band_explode, candidate_pairs
from dedup_ray.stages.signer import sign_docs
from dedup_ray.stages.verify import verify_pairs

VOCAB = [f"w{i}" for i in range(5000)]


def make_pair(rng, n_tokens: int, keep_frac: float) -> tuple[str, str]:
    """Doc pair sharing a prefix of keep_frac tokens; suffix disjoint."""
    base = rng.choice(VOCAB, size=n_tokens, replace=False)
    n_keep = int(n_tokens * keep_frac)
    alt = np.concatenate(
        [base[:n_keep], rng.choice(VOCAB, size=n_tokens - n_keep, replace=False)]
    )
    return " ".join(base), " ".join(alt)


def true_jaccard(a: str, b: str, k: int = 3) -> float:
    def sh(t):
        toks = t.split(" ")
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb)


def test_recall_curve_high_jaccard(ray_session):
    rng = np.random.default_rng(1234)
    cfg = DedupConfig(num_partitions=4)
    ids, texts, pair_rows = [], [], []
    for i in range(260):
        keep = rng.uniform(0.55, 0.98)
        a, b = make_pair(rng, 80, keep)
        ida, idb = f"p{i:03d}a", f"p{i:03d}b"
        ids += [ida, idb]
        texts += [a, b]
        pair_rows.append((ida, idb, true_jaccard(a, b)))
    docs = rd.from_arrow(
        pa.table({"url": pa.array(ids), "text": pa.array(texts, pa.large_string())})
    )
    compact = sign_docs(
        docs, cfg, id_col="url", with_simhash=False, with_chunks=False
    ).materialize()
    bands = band_explode(compact, cfg, id_col="url")
    cands = candidate_pairs(bands, cfg, id_col="url", global_dedup=False)
    accepted = verify_pairs(cands, compact, cfg, id_col="url").to_pandas()
    got = set(zip(accepted["id1"], accepted["id2"]))

    truth = pd.DataFrame(pair_rows, columns=["id1", "id2", "true_j"])
    truth["found"] = [
        ((a, b) in got) or ((b, a) in got)
        for a, b in zip(truth["id1"], truth["id2"])
    ]

    high = truth[truth["true_j"] >= 0.7]
    assert len(high) >= 60, "fixture should produce enough high-J pairs"
    recall_high = high["found"].mean()
    assert recall_high >= 0.99, (
        f"recall {recall_high:.4f} on {len(high)} pairs with true J >= 0.7"
    )

    # monotone sanity on the rest of the curve: mid-J recall below high-J,
    # and the curve is not degenerate (some mid pairs found)
    mid = truth[(truth["true_j"] >= 0.55) & (truth["true_j"] < 0.65)]
    if len(mid) >= 20:
        assert mid["found"].mean() >= 0.5
