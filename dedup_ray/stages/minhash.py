"""MinHash signatures over k-shingles (stateful actor-pool stage).

The deterministic, mergeable replacement for the reference's learned
doc2vec pair distances (``doc2vec_pair_native.py:94-122``, SURVEY.md ST1/ST2):
signature agreement estimates shingle-set Jaccard, and the actor-pool shape
follows ST2 — permutation tables built once per actor in ``__init__``, each
``__call__`` handles one Arrow batch fully vectorized.

Math: h_i(x) = ((a_i * x + b_i) mod 2^64) mod (2^61 - 1), the datasketch-style
wraparound universal hash; ``sig[i] = min over shingles``.  Signatures are
stored as fixed-width little-endian binary (num_perms * 8 bytes) — compact,
Arrow- and pandas-safe.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from dedup_ray.config import DedupConfig
from dedup_ray.stages.shingle import shingle_hash_batch

_MERSENNE = np.uint64((1 << 61) - 1)


def make_perms(num_perms: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, size=num_perms, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, size=num_perms, dtype=np.uint64)
    return a, b


def minhash_signatures(
    values: np.ndarray,
    offsets: np.ndarray,
    a: np.ndarray,
    b: np.ndarray,
    block: int = 4096,
) -> np.ndarray:
    """(n_docs, num_perms) uint64 signature matrix from packed shingle hashes.

    Works in doc-aligned segments of ≤ ``block`` shingles so the
    (num_perms × block) hash panel stays cache-resident: the naive
    whole-batch formulation writes+reads hundreds of MB of intermediate per
    batch and turns the stage memory-bandwidth-bound, which caps multi-core
    scaling well before CPU does.
    """
    n_docs = len(offsets) - 1
    num_perms = len(a)
    sigs = np.empty((n_docs, num_perms), dtype=np.uint64)
    if len(values) == 0:
        sigs.fill(np.iinfo(np.uint64).max)
        return sigs
    a2, b2 = a[:, None], b[:, None]
    i = 0
    with np.errstate(over="ignore"):
        while i < n_docs:
            j = i + 1
            while j < n_docs and offsets[j + 1] - offsets[i] <= block:
                j += 1
            lo, hi = offsets[i], offsets[j]
            if hi - lo <= block or j > i + 1:
                phi = a2 * values[None, lo:hi] + b2
                phi %= _MERSENNE
                segstarts = offsets[i:j] - lo
                sigs[i:j] = np.minimum.reduceat(phi, segstarts, axis=1).T
            else:
                # single oversized doc: sub-chunk its shingles, fold mins
                acc = np.full(num_perms, np.iinfo(np.uint64).max, dtype=np.uint64)
                for s0 in range(lo, hi, block):
                    s1 = min(s0 + block, hi)
                    phi = a2 * values[None, s0:s1] + b2
                    phi %= _MERSENNE
                    np.minimum(acc, phi.min(axis=1), out=acc)
                sigs[i] = acc
            i = j
    return sigs


def pack_signatures(sigs: np.ndarray) -> pa.Array:
    n_docs, num_perms = sigs.shape
    flat = sigs.astype("<u8").tobytes()
    return pa.Array.from_buffers(
        pa.binary(num_perms * 8), n_docs, [None, pa.py_buffer(flat)]
    )


def unpack_signatures(col: pa.ChunkedArray | pa.Array, num_perms: int) -> np.ndarray:
    """Signature column → (n, num_perms) uint64 matrix, zero-copy.

    Handles both layouts the column takes in practice: ``fixed_size_binary``
    (as produced by the signer) and variable-width ``binary``/``large_binary``
    (after a pandas round-trip through a shuffle — bytes objects re-encode as
    variable width).  Every element is exactly ``8 * num_perms`` bytes.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if pa.types.is_fixed_size_binary(col.type):
        arr = np.frombuffer(col.buffers()[1], dtype="<u8")
        start = col.offset * num_perms
        return arr[start : start + n * num_perms].reshape(n, num_perms)
    # variable-width binary: data buffer indexed through the offsets buffer
    off_dtype = "<i8" if pa.types.is_large_binary(col.type) else "<i4"
    offsets = np.frombuffer(col.buffers()[1], dtype=off_dtype)
    start_byte = int(offsets[col.offset])
    total = int(offsets[col.offset + n]) - start_byte
    assert total == n * num_perms * 8, "ragged signature column"
    arr = np.frombuffer(col.buffers()[2], dtype="<u8",
                        offset=start_byte, count=n * num_perms)
    return arr.reshape(n, num_perms)


class MinHashSigner:
    """Actor: pages/docs batch → (id, [digest,] n_shingles, sig) batch.

    With ``include_digest=True`` the stage also emits the exact-dedup content
    digest — extraction, digesting and signing then fuse into ONE streaming
    pass over the text, and the raw text never needs to be materialized
    (the compact signature table is ~1KB/doc regardless of document size).
    """

    def __init__(
        self,
        config: DedupConfig | None = None,
        id_col: str = "url",
        text_col: str = "text",
        include_digest: bool = False,
        digest_algo: str = "md5",
    ) -> None:
        self.cfg = config or DedupConfig()
        self.id_col = id_col
        self.text_col = text_col
        self.include_digest = include_digest
        self.digest_algo = digest_algo
        self.a, self.b = make_perms(self.cfg.num_perms, self.cfg.seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        ids = batch[self.id_col]
        values, offsets = shingle_hash_batch(
            texts, ids.to_pylist(), self.cfg.shingle_k, self.cfg.seed
        )
        sigs = minhash_signatures(values, offsets, self.a, self.b)
        n_shingles = np.diff(offsets).astype(np.int64)
        cols = {self.id_col: ids}
        if self.include_digest:
            from dedup_ray.util.hashing import content_digest

            cols["digest"] = pa.array(
                content_digest(texts, algo=self.digest_algo), pa.string()
            )
        cols["n_shingles"] = pa.array(n_shingles)
        cols["sig"] = pack_signatures(sigs)
        return pa.table(cols)


def minhash_sign(ds, config: DedupConfig | None = None, id_col: str = "url",
                 text_col: str = "text"):
    """Dataset(id, text) → Dataset(id, n_shingles, sig) via an actor pool."""
    cfg = config or DedupConfig()
    return ds.map_batches(
        MinHashSigner,
        fn_constructor_kwargs={"config": cfg, "id_col": id_col, "text_col": text_col},
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=cfg.minhash_concurrency,
    )
