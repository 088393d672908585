"""Similarity (fuzzy) joins on text Jaccard: cross-table and exact self-join.

The engine's dedup paths find near-duplicates WITHIN one corpus; record
linkage across TWO tables (new crawl vs reference corpus, supplier feed vs
catalog — the reference's whole problem shape, `evaluate.py` pairs, applied
across sources) needs a standalone join operator:

    similarity_join(L, R) = { (l, r) : J(shingles(l), shingles(r)) ≥ τ }

Two variants with complementary contracts:

- :func:`similarity_join` (cross-table): **rare-shingle blocking** — a
  pair is a candidate iff it shares a k-shingle with document frequency ≤
  ``max_df`` across both sides.  The df cap bounds every blocking bucket
  (≤ max_df²/4 cross pairs — the cap IS the skew policy) at the price of
  missing pairs whose every common shingle is boilerplate-frequent; at
  τ ≥ 0.5 those are boilerplate mirrors, the substring/CDC tier's job.
- :func:`similarity_self_join`: **prefix filtering** (Chaudhuri/Bayardo
  ``ppjoin`` family) — recall is exactly 1, so the verified output EQUALS
  the brute-force all-pairs answer; the worst case is a hot rare shingle
  (adversarial corpora) rather than a bounded bucket.

Both are engine-reproducible end to end (blocking included), which is what
makes the DuckDB oracles possible: rare-shingle blocking is replayed in
SQL, and the prefix-filter output is checked against brute force (the
guarantee itself).  Shingles travel as 64-bit keyed hashes (collision ≈
|shingles|²/2⁶⁵); the oracle compares shingle strings, so a collision
would surface as a hash mismatch in CI rather than silently.

All reduce bodies are Arrow-native (Acero joins + group_by): a pandas
``merge`` on the expansion stage measured 3.7 s single-process for a
~10⁶-row output where Acero takes milliseconds — at 16 concurrent reduces
that was the difference between a 30 s stage and a sub-second one.

``jaccard`` is the unrounded IEEE division ``inter / (n_l + n_r − inter)``
— identical integer operands give the identical double on any engine, so
the column is hash-comparable without a rounding convention.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

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
    """Flat distinct ``(id, sh, n)`` rows per document, streaming
    (``n`` = the doc's set size, riding along for filters)."""

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
                "n": pa.array(np.repeat(counts, counts), pa.int64()),
            }
        )

    return ds.map_batches(flat, batch_format="pyarrow")


def _guard(t: pa.Table, schema: pa.Schema) -> pa.Table:
    """Void-block guard: an entirely-empty partition arrives column-less."""
    if t.num_rows == 0 and not t.column_names:
        return schema.empty_table()
    return t


def _distinct(t: pa.Table, keys: list[str]) -> pa.Table:
    return t.select(keys).group_by(keys).aggregate([])


def _flat_schema(id_name: str) -> pa.Schema:
    return pa.schema(
        [(id_name, pa.int64()), ("sh", pa.int64()), ("n", pa.int64())]
    )


_CAND = pa.schema([("id_l", pa.int64()), ("id_r", pa.int64())])
_EXPAND = pa.schema(
    [
        ("id_l", pa.int64()),
        ("id_r", pa.int64()),
        ("n_l", pa.int64()),
        ("sh", pa.int64()),
    ]
)


def _out_schema(n1: str, n2: str, i1: str, i2: str,
                score_name: str = "jaccard") -> pa.Schema:
    return pa.schema(
        [
            (i1, pa.int64()),
            (i2, pa.int64()),
            (n1, pa.int64()),
            (n2, pa.int64()),
            ("inter", pa.int64()),
            (score_name, pa.float64()),
        ]
    )


def _attach_left(c: pa.Table, lf: pa.Table) -> pa.Table:
    """Expand deduped candidate pairs with the left side's shingles.
    Pair dedup is globally correct here: every row of one ``id_l``
    co-locates in this partition."""
    cd = _distinct(_guard(c, _CAND), ["id_l", "id_r"])
    fd = _guard(lf, _flat_schema("id_l")).rename_columns(
        ["id_l", "sh", "n_l"]
    )
    return cd.join(fd, keys="id_l", join_type="inner").select(
        ["id_l", "id_r", "n_l", "sh"]
    ).cast(_EXPAND).combine_chunks()


def _verify(
    e: pa.Table, rf: pa.Table, tau: float, out_schema: pa.Schema,
    score: str = "jaccard",
) -> pa.Table:
    """Count the shingle intersection per candidate pair (the partition
    holds each right doc's whole set, so ``n_r`` is exact) and keep pairs
    with exact score ≥ tau.  ``score``: "jaccard" = |∩|/|∪|, or
    "containment" = |∩|/|left| (asymmetric — quote/subset detection)."""
    ed = _guard(e, _EXPAND)
    rd = _guard(rf, _flat_schema("id_r")).rename_columns(["id_r", "sh", "n_r"])
    m = ed.join(rd, keys=["id_r", "sh"], join_type="inner")
    g = m.group_by(["id_l", "id_r", "n_l", "n_r"]).aggregate([("sh", "count")])
    inter = g["sh_count"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_l = g["n_l"].to_numpy(zero_copy_only=False)
    n_r = g["n_r"].to_numpy(zero_copy_only=False)
    if score == "containment":
        jac = inter / np.maximum(n_l, 1)
    else:
        union = n_l + n_r - inter
        jac = inter / np.maximum(union, 1)
    keep = jac >= tau
    names = out_schema.names
    return pa.table(
        {
            names[0]: pa.array(g["id_l"].to_numpy(zero_copy_only=False)[keep]),
            names[1]: pa.array(g["id_r"].to_numpy(zero_copy_only=False)[keep]),
            names[2]: pa.array(n_l[keep]),
            names[3]: pa.array(n_r[keep]),
            "inter": pa.array(inter[keep]),
            names[5]: pa.array(jac[keep]),
        }
    ).cast(out_schema)


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
    score: str = "jaccard",
):
    """Join rows of ``left_ds`` to rows of ``right_ds`` with shingle-set
    score ≥ ``tau``; returns ``(id_l, id_r, n_l, n_r, inter, <score>)``.
    ``score="jaccard"`` (symmetric near-dup) or ``"containment"``
    (|∩|/|left| — asymmetric: "is the left doc mostly contained in the
    right", the quote/excerpt/syndication detector, Broder 1997's other
    resemblance measure).

    Dataflow — three narrow exchanges, no list columns, no driver state:
    blocking on ``sh`` (df cap + cross-side pairs), pair dedup + left
    expansion on ``id_l``, intersection count + score filter on ``id_r``.
    """
    # materialized once: each side is consumed by two exchanges (left by
    # block + expansion, right by block + verify) — lazy, the corpus-wide
    # shingle explode would run twice per side
    left_flat = _flat_shingles(
        left_ds, left_id, left_text, "id_l", k).materialize()
    right_flat = _flat_shingles(
        right_ds, right_id, right_text, "id_r", k).materialize()

    def block(lf: pa.Table, rf: pa.Table) -> pa.Table:
        ld = _guard(lf, _flat_schema("id_l"))
        rd = _guard(rf, _flat_schema("id_r"))
        # document frequency across BOTH sides (rows are distinct per doc;
        # a shingle's rows all hash to this partition, so df is exact)
        both = pa.concat_tables(
            [ld.select(["sh"]), rd.select(["sh"])]
        )
        vc = pc.value_counts(both["sh"].combine_chunks())
        rare = vc.field("values").filter(
            pc.less_equal(vc.field("counts"), max_df)
        )
        ld = ld.filter(pc.is_in(ld["sh"], value_set=rare))
        rd = rd.filter(pc.is_in(rd["sh"], value_set=rare))
        j = ld.select(["id_l", "sh"]).join(
            rd.select(["id_r", "sh"]), keys="sh", join_type="inner"
        )
        return _distinct(j, ["id_l", "id_r"]).cast(_CAND).combine_chunks()

    cand = hash_exchange(
        [left_flat, right_flat],
        ["sh", "sh"],
        block,
        num_partitions=num_partitions,
        return_refs=True,
    )

    expanded = hash_exchange(
        [cand, left_flat],
        ["id_l", "id_l"],
        _attach_left,
        num_partitions=num_partitions,
        return_refs=True,
    )

    out_schema = _out_schema("n_l", "n_r", "id_l", "id_r",
                             score_name=score)

    def verify(e: pa.Table, rf: pa.Table) -> pa.Table:
        return _verify(e, rf, tau, out_schema, score=score)

    return hash_exchange(
        [expanded, right_flat],
        ["id_r", "id_r"],
        verify,
        num_partitions=num_partitions,
    )


def containment_join(left_ds, right_ds, left_id: str, right_id: str,
                     left_text: str = "text", right_text: str = "text",
                     k: int = 3, tau: float = 0.6, max_df: int = 8,
                     num_partitions: int = 16):
    """Asymmetric similarity join on shingle containment |L∩R|/|L| ≥ τ —
    "left is mostly inside right": excerpt/quote detection, syndication
    tracing, benchmark-in-training containment.  Same three-exchange
    dataflow and df-cap blocking as :func:`similarity_join`."""
    return similarity_join(
        left_ds, right_ds, left_id, right_id, left_text, right_text,
        k=k, tau=tau, max_df=max_df, num_partitions=num_partitions,
        score="containment",
    )


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

    Prefix-filtering principle (Chaudhuri/Bayardo ``ppjoin`` family): if
    ``J(A,B) ≥ τ`` then ``|A∩B| ≥ τ·max(|A|,|B|) ≥ ⌈τ·|X|⌉`` for each
    side, and two sets with overlap ≥ o must share an element in their
    ``(|X|−o+1)``-prefixes **under any one global element order** — so
    blocking on prefix elements has recall exactly 1.  The canonical
    order here is ascending (document frequency, hash): prefixes hold
    each set's RAREST shingles, so boilerplate never enters a prefix
    unless a set is tiny — which keeps candidate counts near the shared-
    rare-shingle pair count instead of quadratic.  Worst case is still a
    hot RARE shingle (adversarial corpora): layer the df-capped
    :func:`similarity_join` or the MinHash/LSH tier when that matters
    more than the exactness contract.

    Dataflow — five narrow exchanges, no broadcast (the df table is
    corpus-sized at web scale, so frequencies are attached by
    co-partition on ``sh``, never shipped whole):

      1. df-annotate: flat ``(id, sh, n)`` co-partitioned on ``sh``;
      2. prefix: co-partition on ``id``; per doc rank by (df, sh)
         ascending, keep ranks < ``|X| − ⌈τ|X|⌉ + 1``;
      3. block on ``sh``: in-bucket self-pairs + length filter
         (``τ·max(n_l, n_r) ≤ min`` is necessary for J ≥ τ);
      4-5. expansion + intersection count, shared with the cross join.
    """
    # materialize once: three consumers (df-annotate, and the l/r sides
    # of the expansion join) would otherwise each re-run the corpus-wide
    # tokenize+shingle explode
    full = _flat_shingles(ds, id_col, text_col, "id", k).materialize()

    flat_schema = _flat_schema("id")
    ann_schema = pa.schema(
        [
            ("id", pa.int64()),
            ("sh", pa.int64()),
            ("n", pa.int64()),
            ("df", pa.int64()),
        ]
    )

    def annotate_df(f: pa.Table) -> pa.Table:
        fd = _guard(f, flat_schema)
        counts = fd.group_by(["sh"]).aggregate([("id", "count")])
        j = fd.join(counts, keys="sh", join_type="inner").select(
            ["id", "sh", "n", "id_count"]
        )
        return j.rename_columns(["id", "sh", "n", "df"]).cast(
            ann_schema
        ).combine_chunks()

    annotated = hash_exchange(
        [full], ["sh"], annotate_df,
        num_partitions=num_partitions, return_refs=True,
    )

    def take_prefix(a: pa.Table) -> pa.Table:
        ad = _guard(a, ann_schema)
        order = pc.sort_indices(
            ad,
            sort_keys=[("id", "ascending"), ("df", "ascending"),
                       ("sh", "ascending")],
        )
        ad = ad.take(order)
        ids = ad["id"].to_numpy(zero_copy_only=False)
        # rank within doc: position minus the doc's first-row position
        starts = np.searchsorted(ids, ids, side="left")
        rank = np.arange(len(ids), dtype=np.int64) - starts
        n = ad["n"].to_numpy(zero_copy_only=False)
        plen = n - np.ceil(tau * n).astype(np.int64) + 1
        return ad.filter(pa.array(rank < plen)).select(
            ["id", "sh", "n"]
        ).combine_chunks()

    prefix = hash_exchange(
        [annotated], ["id"], take_prefix,
        num_partitions=num_partitions, return_refs=True,
    )

    def block(pf: pa.Table) -> pa.Table:
        t = _guard(pf, flat_schema)
        lf = t.rename_columns(["id_l", "sh", "n_l"])
        rf = t.rename_columns(["id_r", "sh", "n_r"])
        j = lf.join(rf, keys="sh", join_type="inner")
        n_l = j["n_l"].to_numpy(zero_copy_only=False)
        n_r = j["n_r"].to_numpy(zero_copy_only=False)
        id_l = j["id_l"].to_numpy(zero_copy_only=False)
        id_r = j["id_r"].to_numpy(zero_copy_only=False)
        lo = np.minimum(n_l, n_r)
        hi = np.maximum(n_l, n_r)
        keep = (id_l < id_r) & (lo >= tau * hi)
        return _distinct(
            j.filter(pa.array(keep)), ["id_l", "id_r"]
        ).cast(_CAND).combine_chunks()

    cand = hash_exchange(
        [prefix], ["sh"], block,
        num_partitions=num_partitions, return_refs=True,
    )

    full_l = full.map_batches(
        lambda t: t.rename_columns(["id_l", "sh", "n"]),
        batch_format="pyarrow",
    )
    expanded = hash_exchange(
        [cand, full_l],
        ["id_l", "id_l"],
        _attach_left,
        num_partitions=num_partitions,
        return_refs=True,
    )

    full_r = full.map_batches(
        lambda t: t.rename_columns(["id_r", "sh", "n"]),
        batch_format="pyarrow",
    )
    out_schema = _out_schema("n1", "n2", "id1", "id2")

    def verify(e: pa.Table, rf: pa.Table) -> pa.Table:
        return _verify(e, rf, tau, out_schema)

    return hash_exchange(
        [expanded, full_r],
        ["id_r", "id_r"],
        verify,
        num_partitions=num_partitions,
    )


# --------------------------------------------------------------------------
# Weighted (tf) cosine self-join — the sparse-vector counterpart of the
# shingle-set prefix-filter join above.
# --------------------------------------------------------------------------

_TF_SEED = 0x7C05


def _flat_tf(ds, id_col: str, text_col: str):
    """Flat ``(id, tok, tf, n2)`` term-frequency rows per document under
    the oracle token law (`string_split(text, ' ')`, empties kept, NULL
    text == empty text); ``n2`` = the doc's squared L2 norm Σ tf²."""

    def flat(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        texts = t[text_col].to_pylist()
        uniq: dict[str, int] = {}
        per_doc: list[tuple[np.ndarray, np.ndarray]] = []
        for txt in texts:
            vals, cnts = np.unique(
                np.array(_split_sql(txt), dtype=object), return_counts=True
            )
            per_doc.append((vals, cnts))
            for s in vals:
                uniq.setdefault(s, len(uniq))
        hashes = (
            stable64_array(list(uniq.keys()), seed=_TF_SEED).view(np.int64)
            if uniq
            else np.empty(0, np.int64)
        )
        lens = np.array([len(v) for v, _ in per_doc], dtype=np.int64)
        tok = (
            np.concatenate(
                [
                    hashes[np.fromiter((uniq[s] for s in v), dtype=np.int64,
                                       count=len(v))]
                    for v, _ in per_doc
                ]
            )
            if per_doc
            else np.empty(0, np.int64)
        )
        tf = (
            np.concatenate([c for _, c in per_doc]).astype(np.int64)
            if per_doc
            else np.empty(0, np.int64)
        )
        n2_doc = np.array(
            [int((c.astype(np.int64) ** 2).sum()) for _, c in per_doc],
            dtype=np.int64,
        )
        return pa.table(
            {
                "id": pa.array(np.repeat(ids, lens), pa.int64()),
                "tok": pa.array(tok, pa.int64()),
                "tf": pa.array(tf, pa.int64()),
                "n2": pa.array(np.repeat(n2_doc, lens), pa.int64()),
            }
        )

    return ds.map_batches(flat, batch_format="pyarrow")


_TF_SCHEMA = pa.schema(
    [("id", pa.int64()), ("tok", pa.int64()), ("tf", pa.int64()),
     ("n2", pa.int64())]
)
_TF_ANN = pa.schema(
    [("id", pa.int64()), ("tok", pa.int64()), ("tf", pa.int64()),
     ("n2", pa.int64()), ("df", pa.int64())]
)
_COS_EXPAND = pa.schema(
    [("id_l", pa.int64()), ("id_r", pa.int64()), ("tok", pa.int64()),
     ("tf_l", pa.int64()), ("n2_l", pa.int64())]
)
_COS_OUT = pa.schema(
    [("id1", pa.int64()), ("id2", pa.int64()), ("n2_1", pa.int64()),
     ("n2_2", pa.int64()), ("dot", pa.int64()), ("cosine", pa.float64())]
)


def cosine_self_join(
    ds,
    id_col: str,
    text_col: str = "text",
    tau: float = 0.9,
    num_partitions: int = 16,
):
    """All pairs (id1 < id2) with term-frequency cosine ≥ ``tau`` — the
    WEIGHTED-vector sibling of :func:`similarity_self_join` (AllPairs
    family, Bayardo, Ma & Srikant, WWW 2007): same prefix-filter recall-1
    contract, but the bound is the suffix L2 norm instead of set overlap.

    Prefix principle for unit vectors under one global feature order: if
    two docs share NO feature among x's first p features then
    ``cos(x,y) ≤ ‖x[p:]‖₂`` (Cauchy–Schwarz with ‖y‖=1), so features are
    kept in the prefix while the inclusive suffix norm ≥ τ — and the
    earliest-ranked SHARED feature of any qualifying pair must lie in
    BOTH prefixes (if it misses either prefix, that side's suffix bound
    already caps the pair below τ), so prefix×prefix blocking has recall
    exactly 1 and the verified output EQUALS brute force (the oracle).

    The global order is (df ascending, token hash): prefixes fill with a
    doc's RAREST terms, so on a heavy-tailed vocabulary stopwords never
    block pairs; on an adversarially flat vocabulary the suffix bound
    degenerates toward full vectors (documented trade, same worst case as
    ppjoin's hot rare shingle).

    The τ decision is engine-exact: ``dot`` and the squared norms are
    integers, and the keep rule ``dot² ≥ τ²·n2₁·n2₂`` plus the emitted
    ``cosine = dot / sqrt(n2₁·n2₂)`` are the same correctly-rounded IEEE
    expressions on both engines (products stay far below 2⁵³), so the
    column hash-compares with no rounding convention.

    Dataflow — five narrow exchanges, no broadcast, no driver state:
    df-annotate on ``tok``; prefix cut on ``id``; prefix×prefix block on
    ``tok``; left expansion on ``id_l``; dot + threshold on ``id_r``.
    """
    tau2 = tau * tau
    full = _flat_tf(ds, id_col, text_col).materialize()

    def annotate_df(f: pa.Table) -> pa.Table:
        fd = _guard(f, _TF_SCHEMA)
        counts = fd.group_by(["tok"]).aggregate([("id", "count")])
        j = fd.join(counts, keys="tok", join_type="inner").select(
            ["id", "tok", "tf", "n2", "id_count"]
        )
        return j.rename_columns(
            ["id", "tok", "tf", "n2", "df"]
        ).cast(_TF_ANN).combine_chunks()

    annotated = hash_exchange(
        [full], ["tok"], annotate_df,
        num_partitions=num_partitions, return_refs=True,
    )

    def take_prefix(a: pa.Table) -> pa.Table:
        ad = _guard(a, _TF_ANN)
        order = pc.sort_indices(
            ad,
            sort_keys=[("id", "ascending"), ("df", "ascending"),
                       ("tok", "ascending")],
        )
        ad = ad.take(order)
        ids = ad["id"].to_numpy(zero_copy_only=False)
        tf2 = ad["tf"].to_numpy(zero_copy_only=False).astype(np.float64) ** 2
        n2 = ad["n2"].to_numpy(zero_copy_only=False).astype(np.float64)
        cs = np.cumsum(tf2)
        starts = np.searchsorted(ids, ids, side="left")
        # doc-local exclusive prefix sum of tf² → inclusive suffix norm²
        before = (cs - tf2) - (cs[starts] - tf2[starts])
        suffix = n2 - before
        keep = suffix >= tau2 * n2
        return ad.filter(pa.array(keep)).select(
            ["id", "tok", "tf", "n2"]
        ).combine_chunks()

    prefix = hash_exchange(
        [annotated], ["id"], take_prefix,
        num_partitions=num_partitions, return_refs=True,
    )

    def block(pf: pa.Table) -> pa.Table:
        t = _guard(pf, _TF_SCHEMA)
        lf = t.select(["id", "tok"]).rename_columns(["id_l", "tok"])
        rf = t.select(["id", "tok"]).rename_columns(["id_r", "tok"])
        j = lf.join(rf, keys="tok", join_type="inner")
        keep = pc.less(j["id_l"], j["id_r"])
        return _distinct(
            j.filter(keep), ["id_l", "id_r"]
        ).cast(_CAND).combine_chunks()

    cand = hash_exchange(
        [prefix], ["tok"], block,
        num_partitions=num_partitions, return_refs=True,
    )

    def attach_left(c: pa.Table, lf: pa.Table) -> pa.Table:
        cd = _distinct(_guard(c, _CAND), ["id_l", "id_r"])
        fd = _guard(lf, _TF_SCHEMA).rename_columns(
            ["id_l", "tok", "tf_l", "n2_l"]
        )
        return cd.join(fd, keys="id_l", join_type="inner").select(
            ["id_l", "id_r", "tok", "tf_l", "n2_l"]
        ).cast(_COS_EXPAND).combine_chunks()

    full_l = full
    expanded = hash_exchange(
        [cand, full_l], ["id_l", "id"], attach_left,
        num_partitions=num_partitions, return_refs=True,
    )

    def verify(e: pa.Table, rf: pa.Table) -> pa.Table:
        ed = _guard(e, _COS_EXPAND)
        rd = _guard(rf, _TF_SCHEMA).rename_columns(
            ["id_r", "tok", "tf_r", "n2_r"]
        )
        m = ed.join(rd, keys=["id_r", "tok"], join_type="inner")
        prod = pc.multiply(m["tf_l"], m["tf_r"])
        m = m.append_column("prod", prod)
        g = m.group_by(["id_l", "id_r", "n2_l", "n2_r"]).aggregate(
            [("prod", "sum")]
        )
        dot = g["prod_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        nl2 = g["n2_l"].to_numpy(zero_copy_only=False).astype(np.float64)
        nr2 = g["n2_r"].to_numpy(zero_copy_only=False).astype(np.float64)
        d = dot.astype(np.float64)
        keep = d * d >= tau2 * nl2 * nr2
        cos = d / np.sqrt(nl2 * nr2)
        return pa.table(
            {
                "id1": pa.array(
                    g["id_l"].to_numpy(zero_copy_only=False)[keep]),
                "id2": pa.array(
                    g["id_r"].to_numpy(zero_copy_only=False)[keep]),
                "n2_1": pa.array(
                    g["n2_l"].to_numpy(zero_copy_only=False)[keep]),
                "n2_2": pa.array(
                    g["n2_r"].to_numpy(zero_copy_only=False)[keep]),
                "dot": pa.array(dot[keep]),
                "cosine": pa.array(cos[keep]),
            }
        ).cast(_COS_OUT)

    return hash_exchange(
        [expanded, full], ["id_r", "id"], verify,
        num_partitions=num_partitions,
    )
