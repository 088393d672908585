"""Fused per-document signing stage (the one pass over raw text).

Computes, per batch, everything every downstream path needs — content digest
(exact dedup), MinHash signature (LSH path), SimHash fingerprint (fuzzy
path) and CDC chunk fingerprints (substring path) — so raw text is read
exactly once and only the compact signature table (~1KB/doc) is ever
materialized.  This is the ST2 actor-pool template from SURVEY.md §2.3:
permutation tables / gear tables built once per actor, each ``__call__``
handles one zero-copy Arrow batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from dedup_ray.config import DedupConfig
from dedup_ray.stages.minhash import (
    make_perms,
    minhash_signatures,
    pack_signatures,
)
from dedup_ray.stages.shingle import shingle_hash_batch
from dedup_ray.stages.simhash import simhash_from_shingles
from dedup_ray.stages.substring import _CDC, chunk_batch
from dedup_ray.util.hashing import content_digest


class DocSigner:
    def __init__(
        self,
        config: DedupConfig | None = None,
        id_col: str = "url",
        text_col: str = "text",
        digest_algo: str = "md5",
        with_simhash: bool = True,
        with_chunks: bool = True,
    ) -> None:
        self.cfg = config or DedupConfig()
        self.id_col = id_col
        self.text_col = text_col
        self.digest_algo = digest_algo
        self.with_simhash = with_simhash
        self.with_chunks = with_chunks
        self.a, self.b = make_perms(self.cfg.num_perms, self.cfg.seed)
        self.cdc = _CDC(self.cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        texts = batch[self.text_col].to_pylist()
        ids = batch[self.id_col]
        ids_py = ids.to_pylist()
        values, offsets = shingle_hash_batch(texts, ids_py, cfg.shingle_k, cfg.seed)
        sigs = minhash_signatures(values, offsets, self.a, self.b)
        cols: dict = {
            self.id_col: ids,
            "digest": pa.array(content_digest(texts, algo=self.digest_algo)),
            "n_shingles": pa.array(np.diff(offsets).astype(np.int64)),
            "sig": pack_signatures(sigs),
        }
        if self.with_simhash:
            cols["simhash"] = pa.array(simhash_from_shingles(values, offsets))
        if self.with_chunks:
            cols["chunks"] = chunk_batch(texts, ids_py, cfg, self.cdc)
        return pa.table(cols)


# Per-worker-process signer cache.  The signer's state (permutation table,
# CDC gear table) costs microseconds to build but must not be rebuilt per
# BATCH; caching it per worker process gives the once-per-worker semantics
# of an actor pool WITHOUT actor-pool process spawning — profiling showed
# a fresh pool of N actors costs 10-20s of cold start that dominates and
# does not parallelize (the ST2 actor-pool pattern from SURVEY.md §2.3
# remains the right shape for genuinely expensive state, e.g. model
# scorers; see stages/ann.py).
_SIGNER_CACHE: dict = {}


def _cached_signer(key: tuple, kwargs: dict) -> DocSigner:
    signer = _SIGNER_CACHE.get(key)
    if signer is None:
        signer = _SIGNER_CACHE[key] = DocSigner(**kwargs)
    return signer


def sign_docs(ds, config: DedupConfig | None = None, id_col: str = "url",
              text_col: str = "text", **kwargs):
    cfg = config or DedupConfig()
    ctor = {"config": cfg, "id_col": id_col, "text_col": text_col, **kwargs}
    key = (cfg.config_hash(), id_col, text_col,
           tuple(sorted((k, v) for k, v in kwargs.items())))

    def sign(batch: pa.Table) -> pa.Table:
        return _cached_signer(key, ctor)(batch)

    return ds.map_batches(
        sign,
        batch_format="pyarrow",
        # NOTE: when an upstream map fuses into this stage, batch_size is
        # counted in the fused chain's INPUT rows — see config.sign_batch_size
        batch_size=cfg.sign_batch_size,
    )
