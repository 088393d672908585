"""MinHash signature correctness: estimates true shingle Jaccard; deterministic."""

import numpy as np
import pyarrow as pa

from dedup_ray.config import DedupConfig
from dedup_ray.stages.minhash import (
    MinHashSigner,
    make_perms,
    minhash_signatures,
    pack_signatures,
    unpack_signatures,
)
from dedup_ray.stages.shingle import shingle_hash_batch


def true_jaccard(a: str, b: str, k: int, seed: int) -> float:
    va, oa = shingle_hash_batch([a], ["x"], k, seed)
    vb, ob = shingle_hash_batch([b], ["y"], k, seed)
    sa, sb = set(va.tolist()), set(vb.tolist())
    return len(sa & sb) / len(sa | sb)


def test_signature_estimates_jaccard():
    rng = np.random.default_rng(0)
    vocab = [f"w{i}" for i in range(200)]
    base = " ".join(rng.choice(vocab, 300))
    toks = base.split()
    # ~10% token replacement
    for i in rng.choice(len(toks), 30, replace=False):
        toks[i] = "zz" + str(i)
    other = " ".join(toks)
    cfg = DedupConfig(num_perms=256)
    a_, b_ = make_perms(cfg.num_perms, cfg.seed)
    values, offsets = shingle_hash_batch([base, other], ["a", "b"], 3, cfg.seed)
    sigs = minhash_signatures(values, offsets, a_, b_)
    est = (sigs[0] == sigs[1]).mean()
    truth = true_jaccard(base, other, 3, cfg.seed)
    assert abs(est - truth) < 0.12


def test_identical_texts_identical_signatures():
    cfg = DedupConfig()
    signer = MinHashSigner(cfg)
    t = pa.table({"url": ["u1", "u2"], "text": ["hello world foo bar baz"] * 2})
    out = signer(t)
    sigs = unpack_signatures(out["sig"], cfg.num_perms)
    assert (sigs[0] == sigs[1]).all()


def test_batch_split_invariance():
    """Signatures must not depend on how rows are batched together."""
    cfg = DedupConfig()
    signer = MinHashSigner(cfg)
    texts = ["alpha beta gamma delta", "one two three four five", "x y z w v u"]
    whole = signer(pa.table({"url": ["a", "b", "c"], "text": texts}))
    parts = [
        signer(pa.table({"url": [u], "text": [t]}))
        for u, t in zip(["a", "b", "c"], texts)
    ]
    sw = unpack_signatures(whole["sig"], cfg.num_perms)
    for i, p in enumerate(parts):
        sp = unpack_signatures(p["sig"], cfg.num_perms)
        assert (sw[i] == sp[0]).all()


def test_empty_text_sentinel_unique():
    cfg = DedupConfig()
    signer = MinHashSigner(cfg)
    out = signer(pa.table({"url": ["e1", "e2"], "text": ["", ""]}))
    sigs = unpack_signatures(out["sig"], cfg.num_perms)
    # wordlist.py:24-27 sentinel semantics: empty docs must NOT match each other
    assert (sigs[0] != sigs[1]).any()


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(1)
    sigs = rng.integers(0, 2**61, size=(5, 16), dtype=np.uint64)
    col = pack_signatures(sigs)
    back = unpack_signatures(col, 16)
    assert (back == sigs).all()
