"""Edit-distance-1 self-join via deletion neighborhoods (FastSS).

Fuzzy-key matching at corpus scale — typo-tolerant vocabulary merging,
near-identical URL slugs, OCR-noise token repair — needs "all pairs of
strings within Levenshtein distance 1" WITHOUT the quadratic all-pairs
scan.  The deletion-neighborhood trick (Bocek et al. 2007, "Fast
Similarity Search in Large Dictionaries"): for every string emit the
string itself plus each single-character-deletion variant; any two
strings at edit distance ≤ 1 share at least one variant (substitution →
same deletion at the edit position; insertion/deletion → the longer
one's deletion equals the shorter string; equality → the strings
themselves).  Sharing a variant does NOT imply distance ≤ 1 (``ab`` and
``ba`` share variants ``a`` and ``b`` at distance 2), so candidates are
verified with an exact distance check.

Scale story: one pass emits O(rows × avg_len) variant rows; ONE
exchange on the variant groups candidates; a second exchange on the
canonical pair de-duplicates multi-witness pairs.  No all-pairs stage
anywhere.  Skew bound: a variant shared by ``g`` strings contributes
C(g, 2) candidates — short strings concentrate mass (every
single-char string maps to the empty variant), so callers filter to a
minimum length and ``max_variant_group`` hard-caps pathological groups
(cap hits are an explicit, observable undercount, same policy as the
LSH bucket caps in ``stages/lsh.py``).

Reference parity: the reference normalizes venue/author strings before
exact-key grouping (``venue_author_preprocess.R:17-40``) and has no
fuzzy-key matcher; this operator is the typo-tolerant upgrade of that
blocking step, per SURVEY.md §2.12's extension license.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_EMPTY_PAIRS = pa.schema([("t1", pa.string()), ("t2", pa.string())])


def _edit1(a: str, b: str) -> bool:
    """Exact ``levenshtein(a, b) <= 1`` for the verified-candidate set.

    Distance-1 structure makes the full DP unnecessary: equal lengths →
    at most one mismatching position; lengths off by one → the longer
    equals the shorter with one char inserted (two-pointer scan).
    """
    la, lb = len(a), len(b)
    if la == lb:
        if a == b:
            return True
        diff = 0
        for x, y in zip(a, b):
            if x != y:
                diff += 1
                if diff > 1:
                    return False
        return True
    if abs(la - lb) != 1:
        return False
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def _variant_rows(t: pa.Table, token_col: str) -> pa.Table:
    toks = pc.cast(t[token_col], pa.string()).to_pylist()
    var_out: list[str] = []
    tok_out: list[str] = []
    for tok in toks:
        if tok is None:
            continue
        var_out.append(tok)
        tok_out.append(tok)
        for i in range(len(tok)):
            var_out.append(tok[:i] + tok[i + 1:])
            tok_out.append(tok)
    return pa.table({"variant": pa.array(var_out, pa.string()),
                     "token": pa.array(tok_out, pa.string())})


def edit_distance_self_join(
    ds,
    token_col: str = "token",
    min_len: int = 4,
    num_partitions: int = 8,
    max_variant_group: int | None = 256,
):
    """All distinct-value pairs of ``token_col`` within Levenshtein
    distance 1, as ``(t1, t2)`` with ``t1 < t2``.

    ``min_len`` drops short strings before variant generation (the
    skew/precision filter — deletion neighborhoods of 1–3 char strings
    collide massively).  ``max_variant_group`` caps a variant group's
    size; over-cap groups are dropped whole (documented undercount;
    ``None`` disables).
    """
    from dedup_ray.util.exchange import hash_exchange

    def prep(t: pa.Table) -> pa.Table:
        col = pc.cast(t[token_col], pa.string())
        keep = pc.and_(pc.is_valid(col),
                       pc.greater_equal(pc.utf8_length(col), min_len))
        sub = t.filter(keep)
        # per-batch distinct: shrinks the variant stream ~token-frequency-fold
        return pa.table(
            {token_col: pc.unique(pc.cast(sub[token_col], pa.string()))})

    slim = ds.map_batches(prep, batch_format="pyarrow")

    def distinct_tokens(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({token_col: pa.array([], pa.string())})
        return pa.table({token_col: pc.unique(t[token_col])})

    uniq = hash_exchange([slim], [token_col], distinct_tokens,
                         num_partitions=num_partitions)

    variants = uniq.map_batches(
        lambda t: _variant_rows(t, token_col), batch_format="pyarrow")

    def candidate_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"t1": pa.array([], pa.string()),
                             "t2": pa.array([], pa.string())})
        from dedup_ray.stages.lsh import triangle_pairs_grouped

        df = (t.select(["variant", "token"]).to_pandas()
              .drop_duplicates().sort_values(["variant", "token"]))
        key = df["variant"].to_numpy()
        toks = df["token"].to_numpy()
        # skip_over drops whole oversized variant groups (observable
        # undercount); size-1 groups emit nothing by construction
        i1, i2 = triangle_pairs_grouped(key, skip_over=max_variant_group)
        return pa.table({"t1": pa.array(toks[i1], pa.string()),
                         "t2": pa.array(toks[i2], pa.string())})

    cand = hash_exchange([variants], ["variant"], candidate_pairs,
                         num_partitions=num_partitions)

    def verify_distinct(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _EMPTY_PAIRS.empty_table()
        df = t.select(["t1", "t2"]).to_pandas().drop_duplicates()
        keep = [_edit1(a, b) for a, b in zip(df["t1"], df["t2"])]
        df = df[np.asarray(keep, dtype=bool)]
        return pa.table({"t1": pa.array(df["t1"].tolist(), pa.string()),
                         "t2": pa.array(df["t2"].tolist(), pa.string())})

    return hash_exchange([cand], [["t1", "t2"]], verify_distinct,
                         num_partitions=num_partitions)
