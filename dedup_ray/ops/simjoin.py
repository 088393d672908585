"""Similarity (fuzzy) join between two tables on text Jaccard.

The engine's dedup paths find near-duplicates WITHIN one corpus; record
linkage across TWO tables (new crawl vs reference corpus, supplier feed vs
catalog — the reference's whole problem shape, `evaluate.py` pairs, applied
across sources) needs a standalone join operator:

    similarity_join(L, R) = { (l, r) : J(shingles(l), shingles(r)) ≥ τ }

Blocking is **rare-shingle** based, not MinHash-banded, so the operator is
exactly reproducible by an independent engine (the DuckDB oracle): a pair
is a candidate iff it shares at least one k-shingle whose document
frequency across BOTH sides is ≤ ``max_df``; candidates are then verified
with the exact Jaccard over full distinct-shingle sets.  Consequences,
documented per the custom-operator rule:

- recall is exact for pairs sharing ≥1 rare shingle; a pair of documents
  ALL of whose common shingles are boilerplate-frequent (> max_df) is not
  found — at τ ≥ 0.5 such pairs are boilerplate mirrors, which the
  substring/CDC tier targets instead;
- the df cap bounds every blocking bucket at ``max_df`` docs (≤ max_df²/4
  cross pairs), so no hot-shingle quadratic blow-up: the cap IS the skew
  policy;
- shingles travel as 64-bit keyed hashes (collision ≈ |shingles|²/2⁶⁵ —
  negligible); the oracle compares shingle strings, so a collision would
  surface as a hash mismatch in CI rather than silently.

Dataflow — three narrow exchanges, no list columns, no driver state:

  1. blocking: co-partition both flat ``(id, sh)`` streams on ``sh``;
     per partition compute df, keep rare shingles, emit cross-side pairs;
  2. left attach: co-partition candidates with the left stream on
     ``id_l`` — pair dedup is globally correct here (every row of one
     ``id_l`` co-locates) — and expand each pair to its left shingles
     (bounded: candidates × |set|, candidates already df-capped);
  3. verify: co-partition the expansion with the right stream on
     ``id_r``; matched ``(id_r, sh)`` rows count the intersection, the
     partition holds each right doc's whole set so ``n_r`` is exact.

``jaccard`` is the unrounded IEEE division ``inter / (n_l + n_r − inter)``
— identical integer operands give the identical double on any engine, so
the column is hash-comparable without a rounding convention.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from dedup_ray.util.exchange import hash_exchange
from dedup_ray.util.hashing import stable64_array

_SH_SEED = 0x51AE


def _split_sql(text: str | None) -> list[str]:
    """`string_split(text, ' ')` semantics: split on single space, KEEP
    empty tokens (the oracle's token law; differs from `shingle.tokenize`
    which drops them)."""
    return (text or "").split(" ")


def _doc_shingle_sets(texts: list[str | None], k: int) -> list[np.ndarray]:
    """Distinct k-shingle hashes per text (unique shingle STRINGS hashed
    once per batch).  Docs with < k tokens yield an empty set — mirroring
    the oracle's `range(1, len-1)`, no sentinel."""
    sh_lists: list[list[str]] = []
    uniq: dict[str, int] = {}
    for t in texts:
        toks = _split_sql(t)
        shs = (
            [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
            if len(toks) >= k
            else []
        )
        sh_lists.append(shs)
        for s in shs:
            if s not in uniq:
                uniq[s] = len(uniq)
    hashes = (
        stable64_array(list(uniq.keys()), seed=_SH_SEED).view(np.int64)
        if uniq
        else np.empty(0, dtype=np.int64)
    )
    return [
        np.unique(hashes[np.fromiter((uniq[s] for s in shs), dtype=np.int64)])
        if shs
        else np.empty(0, dtype=np.int64)
        for shs in sh_lists
    ]


def _flat_shingles(ds, id_col: str, text_col: str, out_id: str, k: int):
    """Flat distinct ``(id, sh)`` rows per document, streaming."""

    def flat(t: pa.Table) -> pa.Table:
        sets = _doc_shingle_sets(t[text_col].to_pylist(), k)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        counts = np.array([len(s) for s in sets], dtype=np.int64)
        return pa.table(
            {
                out_id: pa.array(np.repeat(ids, counts), pa.int64()),
                "sh": pa.array(
                    np.concatenate(sets) if sets else np.empty(0, np.int64),
                    pa.int64(),
                ),
            }
        )

    return ds.map_batches(flat, batch_format="pyarrow")


def _pd(t: pa.Table, schema: pa.Schema) -> pd.DataFrame:
    """Void-block guard + pandas conversion."""
    if t.num_rows == 0 and not t.column_names:
        t = schema.empty_table()
    return t.to_pandas()


_FLAT_L = pa.schema([("id_l", pa.int64()), ("sh", pa.int64())])
_FLAT_R = pa.schema([("id_r", pa.int64()), ("sh", pa.int64())])
_CAND = pa.schema([("id_l", pa.int64()), ("id_r", pa.int64())])
_EXPAND = pa.schema(
    [
        ("id_l", pa.int64()),
        ("id_r", pa.int64()),
        ("sh", pa.int64()),
        ("n_l", pa.int64()),
    ]
)
_OUT = pa.schema(
    [
        ("id_l", pa.int64()),
        ("id_r", pa.int64()),
        ("n_l", pa.int64()),
        ("n_r", pa.int64()),
        ("inter", pa.int64()),
        ("jaccard", pa.float64()),
    ]
)


def _prefix_rows(sets: list[np.ndarray], tau: float) -> list[np.ndarray]:
    """Prefix-filter blocking keys: the smallest ``|X| − ⌈τ·|X|⌉ + 1``
    hashes of each (sorted) set.

    Prefix-filtering principle (Chaudhuri/Bayardo ``ppjoin`` family): if
    ``J(A,B) ≥ τ`` then ``|A∩B| ≥ τ·max(|A|,|B|) ≥ ⌈τ·|X|⌉`` for each
    side, and two sorted sets with overlap ≥ o must share an element in
    their ``(|X|−o+1)``-prefixes — so blocking on prefix elements has
    recall exactly 1 with no frequency cap.  Sets are already sorted
    (``np.unique``)."""
    out = []
    for s in sets:
        if len(s) == 0:
            out.append(s)
            continue
        o = int(np.ceil(tau * len(s)))
        out.append(s[: len(s) - o + 1])
    return out


def similarity_self_join(
    ds,
    id_col: str,
    text_col: str = "text",
    k: int = 3,
    tau: float = 0.5,
    num_partitions: int = 16,
):
    """All pairs (id1 < id2) within ONE table with shingle-set Jaccard ≥
    ``tau`` — exact, via prefix filtering: blocking has recall 1 by the
    prefix principle, and candidates are verified with the exact Jaccard,
    so the output EQUALS the brute-force all-pairs answer (which is the
    oracle).  Returns ``(id1, id2, n1, n2, inter, jaccard)``.

    Skew note: prefix elements are each set's smallest hashes, so a
    boilerplate shingle that ranks lowest for many docs makes a hot
    bucket; the in-bucket length filter (``|B| ≥ τ·|A|`` is necessary for
    ``J ≥ τ``) prunes pairs but the worst case stays quadratic in the
    hottest bucket.  This operator trades skew-boundedness for an exact
    recall contract — for adversarial corpora layer the df-capped
    :func:`similarity_join` or the MinHash/LSH tier instead.
    """

    def per_batch(t: pa.Table):
        sets = _doc_shingle_sets(t[text_col].to_pylist(), k)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return sets, ids

    def flat_full(t: pa.Table) -> pa.Table:
        sets, ids = per_batch(t)
        counts = np.array([len(s) for s in sets], dtype=np.int64)
        return pa.table(
            {
                "id": pa.array(np.repeat(ids, counts), pa.int64()),
                "sh": pa.array(
                    np.concatenate(sets) if sets else np.empty(0, np.int64),
                    pa.int64(),
                ),
                # set size rides along so the blocking step can length-filter
                "n": pa.array(np.repeat(counts, counts), pa.int64()),
            }
        )

    def flat_prefix(t: pa.Table) -> pa.Table:
        sets, ids = per_batch(t)
        pref = _prefix_rows(sets, tau)
        counts = np.array([len(p) for p in pref], dtype=np.int64)
        sizes = np.array([len(s) for s in sets], dtype=np.int64)
        return pa.table(
            {
                "id": pa.array(np.repeat(ids, counts), pa.int64()),
                "sh": pa.array(
                    np.concatenate(pref) if pref else np.empty(0, np.int64),
                    pa.int64(),
                ),
                "n": pa.array(np.repeat(sizes, counts), pa.int64()),
            }
        )

    full = ds.map_batches(flat_full, batch_format="pyarrow")
    prefix = ds.map_batches(flat_prefix, batch_format="pyarrow")

    flat_schema = pa.schema(
        [("id", pa.int64()), ("sh", pa.int64()), ("n", pa.int64())]
    )
    cand_schema = pa.schema([("id_l", pa.int64()), ("id_r", pa.int64())])

    def block(pf: pa.Table) -> pa.Table:
        pd_ = _pd(pf, flat_schema)
        pairs = pd_.merge(pd_, on="sh", suffixes=("_l", "_r"))
        pairs = pairs[pairs["id_l"] < pairs["id_r"]]
        # length filter: J >= tau requires tau*max(n_l,n_r) <= min(n_l,n_r)
        lo = np.minimum(pairs["n_l"], pairs["n_r"])
        hi = np.maximum(pairs["n_l"], pairs["n_r"])
        pairs = pairs[lo >= tau * hi]
        out = pairs[["id_l", "id_r"]].drop_duplicates()
        return pa.Table.from_pandas(out, preserve_index=False).cast(cand_schema)

    cand = hash_exchange(
        [prefix],
        ["sh"],
        block,
        num_partitions=num_partitions,
        return_refs=True,
    )

    expand_schema = pa.schema(
        [
            ("id_l", pa.int64()),
            ("id_r", pa.int64()),
            ("sh", pa.int64()),
            ("n_l", pa.int64()),
        ]
    )

    def attach_left(c: pa.Table, f: pa.Table) -> pa.Table:
        cd = _pd(c, cand_schema).drop_duplicates()  # id_l co-located: global
        fd = _pd(f, flat_schema).rename(
            columns={"id": "id_l", "n": "n_l"}
        )
        j = cd.merge(fd, on="id_l")
        return pa.Table.from_pandas(
            j[["id_l", "id_r", "sh", "n_l"]], preserve_index=False
        ).cast(expand_schema)

    expanded = hash_exchange(
        [cand, full],
        ["id_l", "id"],
        attach_left,
        num_partitions=num_partitions,
        return_refs=True,
    )

    out_schema = pa.schema(
        [
            ("id1", pa.int64()),
            ("id2", pa.int64()),
            ("n1", pa.int64()),
            ("n2", pa.int64()),
            ("inter", pa.int64()),
            ("jaccard", pa.float64()),
        ]
    )

    def verify(e: pa.Table, f: pa.Table) -> pa.Table:
        ed = _pd(e, expand_schema)
        fd = _pd(f, flat_schema).rename(columns={"id": "id_r", "n": "n_r"})
        m = ed.merge(fd, on=["id_r", "sh"])
        g = (
            m.groupby(["id_l", "id_r", "n_l", "n_r"], as_index=False)
            .size()
            .rename(columns={"size": "inter"})
        )
        inter = g["inter"].to_numpy(dtype=np.int64)
        union = (g["n_l"] + g["n_r"]).to_numpy(dtype=np.int64) - inter
        jac = inter / np.maximum(union, 1)
        out = pd.DataFrame(
            {
                "id1": g["id_l"],
                "id2": g["id_r"],
                "n1": g["n_l"],
                "n2": g["n_r"],
                "inter": inter,
                "jaccard": jac,
            }
        )
        return pa.Table.from_pandas(
            out[out["jaccard"] >= tau], preserve_index=False
        ).cast(out_schema)

    return hash_exchange(
        [expanded, full],
        ["id_r", "id"],
        verify,
        num_partitions=num_partitions,
    )


def similarity_join(
    left_ds,
    right_ds,
    left_id: str,
    right_id: str,
    left_text: str = "text",
    right_text: str = "text",
    k: int = 3,
    tau: float = 0.5,
    max_df: int = 8,
    num_partitions: int = 16,
):
    """Join rows of ``left_ds`` to rows of ``right_ds`` with shingle-set
    Jaccard ≥ ``tau``; returns ``(id_l, id_r, n_l, n_r, inter, jaccard)``."""
    left_flat = _flat_shingles(left_ds, left_id, left_text, "id_l", k)
    right_flat = _flat_shingles(right_ds, right_id, right_text, "id_r", k)

    def block(lf: pa.Table, rf: pa.Table) -> pa.Table:
        ld = _pd(lf, _FLAT_L)
        rd = _pd(rf, _FLAT_R)
        # document frequency across BOTH sides (rows are distinct per doc;
        # a shingle's rows all hash to this partition, so df is exact)
        df = pd.concat([ld["sh"], rd["sh"]]).value_counts()
        rare = df[df <= max_df].index
        ld = ld[ld["sh"].isin(rare)]
        rd = rd[rd["sh"].isin(rare)]
        pairs = ld.merge(rd, on="sh")[["id_l", "id_r"]].drop_duplicates()
        return pa.Table.from_pandas(pairs, preserve_index=False).cast(_CAND)

    cand = hash_exchange(
        [left_flat, right_flat],
        ["sh", "sh"],
        block,
        num_partitions=num_partitions,
        return_refs=True,
    )

    def attach_left(c: pa.Table, lf: pa.Table) -> pa.Table:
        cd = _pd(c, _CAND).drop_duplicates()  # global: id_l co-located
        ld = _pd(lf, _FLAT_L)
        n_l = ld.groupby("id_l").size().rename("n_l")
        j = cd.merge(ld, on="id_l").join(n_l, on="id_l")
        return pa.Table.from_pandas(
            j[["id_l", "id_r", "sh", "n_l"]], preserve_index=False
        ).cast(_EXPAND)

    expanded = hash_exchange(
        [cand, left_flat],
        ["id_l", "id_l"],
        attach_left,
        num_partitions=num_partitions,
        return_refs=True,
    )

    def verify(e: pa.Table, rf: pa.Table) -> pa.Table:
        ed = _pd(e, _EXPAND)
        rd = _pd(rf, _FLAT_R)
        n_r = rd.groupby("id_r").size().rename("n_r")
        m = ed.merge(rd, on=["id_r", "sh"])
        g = m.groupby(["id_l", "id_r", "n_l"], as_index=False).size()
        g = g.rename(columns={"size": "inter"}).join(n_r, on="id_r")
        inter = g["inter"].to_numpy(dtype=np.int64)
        union = (g["n_l"] + g["n_r"]).to_numpy(dtype=np.int64) - inter
        jac = inter / np.maximum(union, 1)
        out = pd.DataFrame(
            {
                "id_l": g["id_l"],
                "id_r": g["id_r"],
                "n_l": g["n_l"],
                "n_r": g["n_r"],
                "inter": inter,
                "jaccard": jac,
            }
        )
        return pa.Table.from_pandas(
            out[out["jaccard"] >= tau], preserve_index=False
        ).cast(_OUT)

    return hash_exchange(
        [expanded, right_flat],
        ["id_r", "id_r"],
        verify,
        num_partitions=num_partitions,
    )
