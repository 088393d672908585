"""SimHash fingerprints: similarity monotonicity + banding guarantee."""

import numpy as np

from dedup_ray.config import DedupConfig
from dedup_ray.stages.shingle import shingle_hash_batch
from dedup_ray.stages.simhash import hamming, simhash_from_shingles

CFG = DedupConfig()


def fp_of(texts, ids):
    v, o = shingle_hash_batch(texts, ids, CFG.shingle_k, CFG.seed)
    return simhash_from_shingles(v, o)


def test_identical_docs_identical_fp():
    fps = fp_of(["the quick brown fox jumps over the dog"] * 2, ["a", "b"])
    assert fps[0] == fps[1]


def test_similar_closer_than_dissimilar():
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(500)]
    base_toks = list(rng.choice(vocab, 400))
    near_toks = list(base_toks)
    for i in rng.choice(400, 2, replace=False):  # 0.5% edits: SimHash's regime
        near_toks[i] = "zz" + str(i)
    far_toks = list(rng.choice(vocab, 400))
    fps = fp_of(
        [" ".join(base_toks), " ".join(near_toks), " ".join(far_toks)],
        ["a", "b", "c"],
    )
    d_near = hamming(fps[:1], fps[1:2])[0]
    d_far = hamming(fps[:1], fps[2:3])[0]
    assert d_near < d_far
    assert d_near <= CFG.simhash_max_hamming


def test_hamming_popcount():
    a = np.array([0b1011, 0], dtype=np.int64)
    b = np.array([0b0010, -1], dtype=np.int64)
    assert hamming(a, b).tolist() == [2, 64]
