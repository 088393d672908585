"""MinHash signature correctness: estimates true shingle Jaccard; deterministic."""

import numpy as np
import pyarrow as pa

import ray.data

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


def test_bbit_estimator_tracks_true_jaccard():
    from dedup_ray.stages.minhash import bbit_estimate_pairs, bbit_minhash_md5

    rng = np.random.default_rng(31)
    vocab = [f"t{i}" for i in range(2000)]
    # adjacent pairs with planted overlap levels
    texts = []
    base = list(rng.choice(vocab, size=400, replace=False))
    for frac in [1.0, 0.8, 0.5, 0.0]:
        texts.append(" ".join(base))
        k = int(len(base) * frac)
        other = [v for v in vocab if v not in base]
        texts.append(" ".join(base[:k]
                              + list(rng.choice(other, size=400 - k,
                                                replace=False))))
    docs = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })
    ds = ray.data.from_arrow(docs).repartition(1)
    regs = bbit_minhash_md5(ds, n_perms=256, b=2)
    out = bbit_estimate_pairs(regs, b=2, n_perms=256,
                              num_partitions=2).to_pandas()
    got = dict(zip(out["id1"], out["est_jaccard"]))

    def true_j(a, b):
        sa, sb = set(a.split()), set(b.split())
        return len(sa & sb) / len(sa | sb)

    # 256 perms, b=2: se ~ sqrt(c+(1-c)J)/... loose tolerance 0.12
    for i in [0, 2, 4, 6]:
        tj = true_j(texts[i], texts[i + 1])
        assert abs(got[i] - tj) < 0.12, (i, got[i], tj)


def test_bbit_registers_shape_and_determinism():
    from dedup_ray.stages.minhash import bbit_minhash_md5

    docs = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["a b c", ""]),  # empty -> sentinel token
    })
    r1 = bbit_minhash_md5(ray.data.from_arrow(docs), n_perms=8,
                          b=2).to_pandas()
    r2 = bbit_minhash_md5(ray.data.from_arrow(docs).repartition(2),
                          n_perms=8, b=2).to_pandas()
    key = ["doc_id", "perm"]
    assert len(r1) == 16
    assert r1.sort_values(key).reg.tolist() == \
        r2.sort_values(key).reg.tolist()
    assert r1.reg.between(0, 3).all()
