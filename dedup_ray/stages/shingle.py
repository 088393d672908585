"""Tokenization and k-shingle hashing (vectorized).

Replaces the reference's token-explode (``wordlist.py:23-32``, SURVEY.md M4)
as the unit fed to MinHash.  Two semantics are preserved exactly:

- the **null sentinel**: a document with no tokens contributes a single
  sentinel shingle derived from its own id, so it "does not intersect with
  any other" (``wordlist.py:24-27``);
- determinism: token hashes are keyed BLAKE2b; shingle hashes are a fixed
  wraparound-uint64 polynomial over the token hashes, so signatures are
  identical across runs, batch layouts and cluster sizes.

The per-batch hot path hashes only the *unique* tokens of the batch
(python loop over the vocabulary), then combines token-hash arrays into
shingle hashes fully vectorized in numpy.
"""

from __future__ import annotations

import numpy as np

from dedup_ray.util.hashing import _GOLDEN, mix64, stable64, stable64_array


def tokenize(text: str) -> list[str]:
    """Whitespace tokenization (split on runs of whitespace, drop empties)."""
    return text.split()


def shingle_hash_batch(
    texts: list[str | None],
    doc_ids: list,
    k: int,
    seed: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Hash the k-shingles of each text.

    Returns ``(values, offsets)``: ``values`` is the concatenated uint64
    shingle hashes of all docs; ``offsets[i]:offsets[i+1]`` slices doc i
    (len(offsets) == len(texts)+1).  Docs shorter than k tokens get one
    shingle over all their tokens; empty docs get the id-derived sentinel.
    """
    tok_lists: list[list[str]] = []
    vocab: dict[str, int] = {}
    for t in texts:
        toks = tokenize(t) if t else []
        tok_lists.append(toks)
        for w in toks:
            if w not in vocab:
                vocab[w] = len(vocab)

    tok_hash = (
        stable64_array(list(vocab.keys()), seed=seed)
        if vocab
        else np.empty(0, dtype=np.uint64)
    )

    values_parts: list[np.ndarray] = []
    offsets = np.empty(len(texts) + 1, dtype=np.int64)
    offsets[0] = 0
    with np.errstate(over="ignore"):
        for i, toks in enumerate(tok_lists):
            if not toks:
                sh = np.array(
                    [stable64(f"\x00sentinel:{doc_ids[i]}", seed=seed)],
                    dtype=np.uint64,
                )
            else:
                h = tok_hash[np.fromiter((vocab[w] for w in toks), dtype=np.int64)]
                kk = min(k, len(h))
                # rolling polynomial over windows of kk token hashes
                acc = np.zeros(len(h) - kk + 1, dtype=np.uint64)
                for j in range(kk):
                    acc = mix64(acc * _GOLDEN + h[j : len(h) - kk + 1 + j])
                sh = acc
            values_parts.append(sh)
            offsets[i + 1] = offsets[i] + len(sh)
    values = (
        np.concatenate(values_parts) if values_parts else np.empty(0, dtype=np.uint64)
    )
    return values, offsets


# ---------------------------------------------------------------------------
# (w, k)-minimizer sketch — the genomics fingerprint, applied to text
# ---------------------------------------------------------------------------

def minimizer_rows(texts: list[str | None], k: int, w: int):
    """Per-text sorted distinct (w, k)-minimizers as hex16 md5 strings.

    The minimizer scheme (Roberts et al. 2004, the k-mer sketch behind
    minimap2): hash every k-character gram; in every window of ``w``
    consecutive gram positions keep the minimum hash.  Adjacent windows
    share their minimum ~(w-1)/(w+1) of the time, so the distinct-set
    output is ~2/(w+1) of the gram stream — a positionally-stable
    fingerprint set (unlike MinHash, a shared minimizer pins an ALIGNED
    shared substring, so matches localize).  Texts shorter than ``k``
    contribute nothing; texts with fewer than ``w`` grams contribute the
    single min over all their grams.

    Hash = first 16 hex chars of md5 of the raw k-gram — public-spec,
    so the whole sketch replays in SQL as ``min(substr(md5(substr(text,
    i, k)), 1, 16)) OVER (... ROWS BETWEEN CURRENT ROW AND w-1
    FOLLOWING)`` (lexicographic hex16 == numeric uint64 order).
    Returns ``(list_of_minimizer_lists)`` aligned with ``texts``.
    """
    import hashlib

    from numpy.lib.stride_tricks import sliding_window_view

    from dedup_ray.util.hashing import content_digest

    md5 = hashlib.md5
    try:  # OpenSSL's non-FIPS constructor skips per-call policy checks
        # (~1.25x on 8-byte messages); identical digests
        md5(b"", usedforsecurity=False)
        import functools

        md5 = functools.partial(hashlib.md5, usedforsecurity=False)
    except (TypeError, ValueError):
        pass
    out: list[list[str]] = []
    for txt in texts:
        txt = txt or ""
        n_pos = len(txt) - k + 1
        if n_pos < 1:
            out.append([])
            continue
        b = txt.encode("utf-8", "surrogatepass")
        if len(b) == len(txt):
            # ASCII fast path: byte slices == char slices, and
            # int(hexdigest[:16], 16) == big-endian digest[:8]
            hv = np.frombuffer(
                b"".join([md5(b[j:j + k]).digest()[:8]
                          for j in range(n_pos)]), dtype=">u8")
        else:
            dg = content_digest([txt[j:j + k] for j in range(n_pos)],
                                algo="md5")
            hv = np.array([int(d[:16], 16) for d in dg], dtype=np.uint64)
        if n_pos <= w:
            mins = hv.min(keepdims=True)
        else:
            mins = sliding_window_view(hv, w).min(axis=1)
        out.append([format(v, "016x") for v in np.unique(mins)])
    return out


def minimizer_sketch(ds, id_col: str = "doc_id", text_col: str = "text",
                     k: int = 8, w: int = 16):
    """Explode each document into its distinct (w, k)-minimizer rows
    ``(id, minimizer)`` — candidate generation for aligned-substring
    dedup: two docs sharing a minimizer share (w.h.p.) the underlying
    k-gram at an aligned position, so a groupby on ``minimizer`` is the
    blocking key for substring-level near-dup candidates at ~2/(w+1)
    of the gram-stream volume.  Shuffle-free; one vectorized pass."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def f(t):
        texts = pc.cast(t[text_col], pa.large_string()).to_pylist()
        per_doc = minimizer_rows(texts, k, w)
        counts = [len(m) for m in per_doc]
        ids = t[id_col].take(
            pa.array(np.repeat(np.arange(len(counts)), counts)))
        flat = [m for doc in per_doc for m in doc]
        return pa.table({id_col: ids,
                         "minimizer": pa.array(flat, pa.string())})

    # modest batch size: the md5-per-gram loop is the cost center, and
    # smaller batches let the task pool balance it across cores
    return ds.map_batches(f, batch_format="pyarrow", batch_size=256)


def minimizer_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                    k: int = 8, w: int = 16, min_shared: int = 2,
                    num_partitions: int = 8,
                    max_bucket: int | None = 256):
    """Near-dup candidate pairs from shared (w, k)-minimizers: docs
    sharing ``min_shared``+ minimizers, with the shared count — the
    aligned-substring blocking tier (a shared minimizer certifies a
    shared k-gram at a window-stable position, so candidates localize
    to truly overlapping content; MinHash/LSH candidates certify only
    set-level similarity).

    One exchange on the minimizer buckets docs (same shape as the LSH
    band shuffle); per-bucket pair emission is capped at ``max_bucket``
    docs (boilerplate minimizers — the df-cap policy of
    ``stages/lsh.py``, an observable undercount); a second exchange on
    the pair key sums shared counts and applies ``min_shared``.
    Returns ``(id1, id2, n_shared)`` with id1 < id2.
    """
    import pyarrow as pa

    from dedup_ray.util.exchange import hash_exchange

    try:  # native id dtype (string urls OR int64 doc ids) for void blocks
        id_t = ds.schema().base_schema.field(id_col).type
    except Exception:
        id_t = pa.int64()

    sk = minimizer_sketch(ds, id_col=id_col, text_col=text_col, k=k, w=w)

    def bucket_pairs(t: pa.Table) -> pa.Table:
        empty = pa.table({"id1": pa.array([], id_t),
                          "id2": pa.array([], id_t),
                          "n": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        from dedup_ray.stages.lsh import triangle_pairs_grouped

        df = (t.select(["minimizer", id_col]).to_pandas()
              .drop_duplicates().sort_values(["minimizer", id_col]))
        key = df["minimizer"].to_numpy()
        ids = df[id_col].to_numpy()
        # skip_over drops whole oversized buckets (observable
        # undercount) — the historical skip semantics, not a cap
        i1, i2 = triangle_pairs_grouped(key, skip_over=max_bucket)
        if not len(i1):
            return empty
        return pa.table({"id1": pa.array(ids[i1], id_t),
                         "id2": pa.array(ids[i2], id_t),
                         "n": pa.array(np.ones(len(i1), np.int64))})

    cand = hash_exchange([sk], ["minimizer"], bucket_pairs,
                         num_partitions=num_partitions)

    def reduce_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"id1": pa.array([], id_t),
                             "id2": pa.array([], id_t),
                             "n_shared": pa.array([], pa.int64())})
        g = t.group_by(["id1", "id2"]).aggregate([("n", "sum")])
        import pyarrow.compute as pc

        g = g.filter(pc.greater_equal(g["n_sum"], min_shared))
        return g.rename_columns(["id1", "id2", "n_shared"])

    return hash_exchange([cand], [["id1", "id2"]], reduce_pairs,
                         num_partitions=num_partitions)
