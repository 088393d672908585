"""Mergeable distinct-count sketch (HyperLogLog) over corpus tokens.

At 100 TB, "how many distinct tokens / urls / shingles" is a sketch
question — an exact distinct is a corpus-wide shuffle.  HLL registers
merge with ``max``, so the whole sketch is: one vectorized register pass
per batch (≤ ``m`` partial rows emitted per batch, regardless of batch
size) and one tiny ``groupby.max`` over ``m`` register ids.  Nothing
corpus-sized moves.

The hash is md5 — deliberately public, like ``stages/ordering.py``: the
register table ``(idx, rho)`` is EXACTLY reproducible by any engine from
the data alone, so the sketch itself (not just a tolerance band around
its estimate) is oracle-checkable.  Layout per token::

    h = md5(token)                    # 32 hex chars
    idx = int(h[0:2], 16)             # register, p=8 → m=256
    rho = leading-zero BITS of h[2:15] (52 bits) + 1   # ∈ [1, 53]

The float estimator (``hll_estimate``) applies the standard bias-corrected
formula with linear counting for the small range; it is kept OUT of the
oracle-checked surface (libm ``ln`` is not bit-specified across engines)
and is instead property-tested against exact distinct counts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

HLL_P = 8
HLL_M = 1 << HLL_P  # 256 registers
_REST_HEX = 13  # hex chars of rho material → 52 bits


def _hex_vals(dg: list[str], n_chars: int) -> np.ndarray:
    """(len(dg), n_chars) int matrix of hex-digit values, vectorized."""
    u = np.array(dg, dtype=f"U{n_chars}")
    codes = u.view(np.uint32).reshape(len(dg), n_chars).astype(np.int64)
    return codes - 48 - 39 * (codes >= 97)


def hll_partial(tokens: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(idx, rho) per token from md5 — vectorized after the digest pass."""
    import hashlib

    dg = [hashlib.md5(t.encode("utf-8", "surrogatepass")).hexdigest()
          for t in tokens]
    vals = _hex_vals(dg, 2 + _REST_HEX)
    idx = vals[:, 0] * 16 + vals[:, 1]
    rest = vals[:, 2:]
    nz = rest != 0
    any_nz = nz.any(axis=1)
    first_nz = np.where(any_nz, nz.argmax(axis=1), _REST_HEX)
    # leading zero bits inside the first nonzero hex digit
    d = rest[np.arange(len(dg)), np.minimum(first_nz, _REST_HEX - 1)]
    in_digit = np.select(
        [d >= 8, d >= 4, d >= 2], [0, 1, 2], default=3
    )
    rho = np.where(any_nz, 4 * first_nz + in_digit + 1, 4 * _REST_HEX + 1)
    return idx, rho.astype(np.int64)


def hll_token_registers(ds, text_col: str = "text"):
    """Corpus-distinct-token HLL registers: Dataset ``(idx, rho)``, one row
    per touched register, ``rho`` already max-merged."""

    def partial(t: pa.Table) -> pa.Table:
        txt = t[text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        txt = pc.coalesce(txt, pa.scalar("", txt.type))  # null text == ""
        toks = pc.list_flatten(pc.split_pattern(txt, " "))
        tok_list = toks.to_pylist()
        if not tok_list:
            return pa.table({"idx": pa.array([], pa.int64()),
                             "rho": pa.array([], pa.int64())})
        idx, rho = hll_partial(tok_list)
        regs = np.zeros(HLL_M, np.int64)
        np.maximum.at(regs, idx, rho)
        hit = np.flatnonzero(regs)
        return pa.table({"idx": pa.array(hit),
                         "rho": pa.array(regs[hit])})

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def rename(t: pa.Table) -> pa.Table:
        if "max(rho)" not in t.column_names:  # empty-corpus aggregate
            return pa.table({"idx": pa.array([], pa.int64()),
                             "rho": pa.array([], pa.int64())})
        return pa.table({"idx": t["idx"],
                         "rho": pc.cast(t["max(rho)"], pa.int64())})

    return partials.groupby("idx").max("rho").map_batches(
        rename, batch_format="pyarrow"
    )


def hll_grouped_registers(ds, group_col: str, value_col: str):
    """Per-GROUP distinct-value HLL registers: Dataset
    ``(group_col, idx, rho)``, one row per (group, touched register).

    The grouped form of :func:`hll_token_registers` — "distinct users
    per host / per event type" at fixed memory: every group's sketch is
    ≤ ``HLL_M`` register rows regardless of its cardinality, partials
    merge by MAX through one grouped aggregate, and the register layout
    stays md5-reproducible so a SQL oracle can rebuild it
    register-for-register.  Estimate per group via
    :func:`hll_estimate` over one group's ``(idx, rho)`` rows.
    """

    def partial(t: pa.Table) -> pa.Table:
        vals = t[value_col]
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        vals = pc.cast(vals, pa.string())
        groups = t[group_col]
        v_list = vals.to_pylist()
        if not v_list:
            return pa.table({group_col: groups.slice(0, 0),
                             "idx": pa.array([], pa.int64()),
                             "rho": pa.array([], pa.int64())})
        idx, rho = hll_partial([v or "" for v in v_list])
        # per-(group, idx) max within the batch: factorize the group col
        de = groups.combine_chunks().dictionary_encode()
        g_idx = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_groups = len(de.dictionary)
        regs = np.zeros((n_groups, HLL_M), np.int64)
        np.maximum.at(regs, (g_idx, idx), rho)
        gs, ix = np.nonzero(regs)
        return pa.table({
            group_col: de.dictionary.take(pa.array(gs, pa.int64())),
            "idx": pa.array(ix.astype(np.int64)),
            "rho": pa.array(regs[gs, ix]),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def rename(t: pa.Table) -> pa.Table:
        if "max(rho)" not in t.column_names:  # empty aggregate
            return pa.table({group_col: pa.array([], pa.string()),
                             "idx": pa.array([], pa.int64()),
                             "rho": pa.array([], pa.int64())})
        return pa.table({group_col: t[group_col], "idx": t["idx"],
                         "rho": pc.cast(t["max(rho)"], pa.int64())})

    return partials.groupby([group_col, "idx"]).max("rho").map_batches(
        rename, batch_format="pyarrow"
    )


CMS_D = 4  # Count-Min hash rows
CMS_W = 256  # buckets per row = one md5 hex-digit pair


def cms_partial(tokens: list[str]) -> np.ndarray:
    """(CMS_D, CMS_W) count matrix for one token batch.

    Row ``j`` buckets a token by md5 hex digits ``[2j, 2j+1]`` — disjoint
    slices of ONE strong digest stand in for d independent hashes (the
    Kirsch–Mitzenmacher device), which keeps the register layout exactly
    reproducible by a SQL oracle: any engine recomputes every bucket from
    ``md5(token)`` alone.
    """
    from dedup_ray.util.hashing import content_digest

    vals = _hex_vals(content_digest(tokens), 2 * CMS_D)
    counts = np.zeros((CMS_D, CMS_W), np.int64)
    for j in range(CMS_D):
        b = vals[:, 2 * j] * 16 + vals[:, 2 * j + 1]
        np.add.at(counts[j], b, 1)
    return counts


def cms_token_registers(ds, text_col: str = "text"):
    """Corpus token-frequency Count-Min sketch (Cormode–Muthukrishnan '05):
    Dataset ``(hrow, bucket, cnt)``, one row per touched register.

    Registers merge by SUM, so the whole sketch is one vectorized pass
    (≤ d·w = 1024 partial rows per batch, independent of batch size) and
    one tiny grouped sum — the frequency analog of the HLL distinct
    sketch above, with the same register-for-register oracle story.
    Point queries via :func:`cms_estimate` overcount only:
    ``min_j cnt[j, b_j(t)] ≥ true(t)``, and exceeds it by ≈ N/w per row
    in expectation.
    """

    def partial(t: pa.Table) -> pa.Table:
        txt = t[text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        txt = pc.coalesce(txt, pa.scalar("", txt.type))  # null text == ""
        toks = pc.list_flatten(pc.split_pattern(txt, " "))
        tok_list = toks.to_pylist()
        if not tok_list:
            return pa.table({"hrow": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        counts = cms_partial(tok_list)
        r, b = np.nonzero(counts)
        return pa.table({"hrow": pa.array(r.astype(np.int64)),
                         "bucket": pa.array(b.astype(np.int64)),
                         "cnt": pa.array(counts[r, b])})

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def rename(t: pa.Table) -> pa.Table:
        if "sum(cnt)" not in t.column_names:  # empty-corpus aggregate
            return pa.table({"hrow": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        return pa.table({"hrow": t["hrow"], "bucket": t["bucket"],
                         "cnt": pc.cast(t["sum(cnt)"], pa.int64())})

    return partials.groupby(["hrow", "bucket"]).sum("cnt").map_batches(
        rename, batch_format="pyarrow"
    )


def cms_estimate(registers, tokens: list[str]) -> np.ndarray:
    """Driver-side point queries against a register table (pandas or Arrow
    with columns hrow/bucket/cnt): est(t) = min over rows — never below the
    true count."""
    if hasattr(registers, "to_pandas"):
        registers = registers.to_pandas()
    table = np.zeros((CMS_D, CMS_W), np.int64)
    table[registers["hrow"].to_numpy(), registers["bucket"].to_numpy()] = (
        registers["cnt"].to_numpy()
    )
    from dedup_ray.util.hashing import content_digest

    vals = _hex_vals(content_digest(tokens), 2 * CMS_D)
    ests = np.full(len(tokens), np.iinfo(np.int64).max)
    for j in range(CMS_D):
        b = vals[:, 2 * j] * 16 + vals[:, 2 * j + 1]
        ests = np.minimum(ests, table[j, b])
    return ests


def bloom_build(hashes: np.ndarray, bits_log2: int = 24,
                k: int = 4) -> np.ndarray:
    """Bloom bitset (uint64 words) from 64-bit element hashes.

    The membership sketch for broadcast sides too large to ship raw: a
    2²⁴-bit filter is 2 MB regardless of element count (vs 8 B/element for
    the exact set) at ~(1−e^(−kn/m))^k false-positive rate.  Probe
    positions derive from ``k`` splitmix remixes of the element hash, so
    build and query agree by construction.
    """
    from dedup_ray.util.hashing import mix64

    m = 1 << bits_log2
    words = np.zeros(m >> 6, np.uint64)
    h = hashes.astype(np.uint64, copy=True)
    mask = np.uint64(m - 1)
    for i in range(k):
        with np.errstate(over="ignore"):
            h = mix64(h + np.uint64((i * 0x9E3779B97F4A7C15 + 1)
                                     & 0xFFFFFFFFFFFFFFFF))
        pos = h & mask
        np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))
    return words


def bloom_contains(words: np.ndarray, hashes: np.ndarray,
                   k: int = 4) -> np.ndarray:
    """Vectorized membership probe; false positives possible, false
    negatives impossible — the safe direction for decontamination (a FP
    flags an extra training doc, never hides a contaminated one)."""
    from dedup_ray.util.hashing import mix64

    m = np.uint64(len(words) << 6)
    mask = m - np.uint64(1)
    out = np.ones(len(hashes), bool)
    h = hashes.astype(np.uint64, copy=True)
    for i in range(k):
        with np.errstate(over="ignore"):
            h = mix64(h + np.uint64((i * 0x9E3779B97F4A7C15 + 1)
                                     & 0xFFFFFFFFFFFFFFFF))
        pos = h & mask
        bit = (words[(pos >> np.uint64(6)).astype(np.int64)]
               >> (pos & np.uint64(63))) & np.uint64(1)
        out &= bit.astype(bool)
    return out


def hll_estimate(registers) -> float:
    """Bias-corrected HLL estimate from a ``(idx, rho)`` table/Dataset.
    Registers never touched count as zero."""
    import pandas as pd

    if hasattr(registers, "to_pandas"):
        df = registers.to_pandas()
    elif isinstance(registers, pd.DataFrame):
        df = registers
    else:
        df = pa.table(registers).to_pandas()
    regs = np.zeros(HLL_M, np.float64)
    if len(df):
        regs[df["idx"].to_numpy()] = df["rho"].to_numpy()
    m = float(HLL_M)
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m / np.sum(np.exp2(-regs))
    zeros = int(np.sum(regs == 0))
    if e <= 2.5 * m and zeros > 0:
        e = m * np.log(m / zeros)
    return float(e)


# --------------------------------------------------------------------------
# DDSketch-style mergeable quantile sketch (Masson/Lee/Rim, VLDB'19 idea):
# relative-error-bounded quantiles over unbounded positive values.  The
# exact value-count histogram (doc_length_quantiles) is the right tool for
# low-cardinality ints; for continuous values at 100 TB its driver state is
# corpus-sized — this sketch's state is <= log_gamma(max/min) bins
# (~2,300 bins spanning 10 orders of magnitude at 1% error), mergeable by
# plain addition and deterministic at any parallelism (no randomness: the
# bin of a value is a pure function of the value).
# --------------------------------------------------------------------------

def dd_gamma(rel_err: float) -> float:
    """γ such that midpoint estimates carry relative error ≤ ``rel_err``."""
    return (1.0 + rel_err) / (1.0 - rel_err)


def dd_bins(values: np.ndarray, gamma: float) -> np.ndarray:
    """DDSketch bin per positive value: ``ceil(log_γ v)`` (vectorized)."""
    return np.ceil(np.log(values) / np.log(gamma)).astype(np.int64)


def dd_sketch(ds, value_col: str, rel_err: float = 0.01):
    """Dataset → sketch Dataset(bin:int64, n:int64).

    ONE grouped sum merges per-batch partials; nothing else moves.  Rows
    with non-positive or null values are excluded (log-bins are defined on
    v > 0) — count them separately if the distribution needs them.
    """
    from ray.data.aggregate import Sum

    gamma = dd_gamma(rel_err)

    def partial(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[np.isfinite(v) & (v > 0)]
        bins, counts = np.unique(dd_bins(v, gamma), return_counts=True)
        return pa.table(
            {
                "bin": pa.array(bins, pa.int64()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
    )


def dd_quantiles(sketch, qs: list[float], rel_err: float = 0.01):
    """Sketch rows → midpoint quantile estimates (driver-side: the sketch
    is bounded by bin count, not corpus size).

    Rank convention: the estimate for ``q`` is the bin holding order
    statistic ``floor(q·(n−1))`` (0-indexed); the midpoint ``2γ^b/(γ+1)``
    is within ``rel_err`` of every value in the bin.
    """
    import pandas as pd

    df = (
        sketch.to_pandas()
        if hasattr(sketch, "to_pandas")
        else pd.DataFrame(sketch)
    )
    # a zero-row sketch arrives as a column-less frame (empty groupby)
    if len(df) == 0 or "bin" not in df.columns or int(df["n"].sum()) == 0:
        raise ValueError(
            "empty sketch: no positive finite values were sketched"
        )
    df = df.sort_values("bin").reset_index(drop=True)
    gamma = dd_gamma(rel_err)
    total = int(df["n"].sum())
    cum = df["n"].cumsum().to_numpy()
    out = []
    for q in qs:
        rank = int(np.floor(q * (total - 1)))
        i = int(np.searchsorted(cum, rank + 1))
        b = int(df["bin"].iloc[i])
        out.append(2.0 * gamma**b / (gamma + 1.0))
    return out


def dd_sketch_grouped(ds, value_col: str, group_cols: list[str],
                      rel_err: float = 0.01):
    """Grouped DDSketch: Dataset → (group_cols…, bin, n) — one grouped sum
    merges per-batch partials, exactly the global form with the group key
    prepended.  Extraction cost is bounded by groups × bins, not corpus
    size."""
    import pandas as pd
    from ray.data.aggregate import Sum

    gamma = dd_gamma(rel_err)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].to_numpy(dtype=np.float64, na_value=np.nan)
        keep = np.isfinite(v) & (v > 0)
        sub = df.loc[keep, group_cols].copy()
        sub["bin"] = dd_bins(v[keep], gamma)
        out = (
            sub.groupby(group_cols + ["bin"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        out["n"] = out["n"].astype("int64")
        return out

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(group_cols + ["bin"])
        .aggregate(Sum("n", alias_name="n"))
    )


def dd_quantiles_grouped(sketch, group_cols: list[str], qs: list[float],
                         rel_err: float = 0.01):
    """Grouped sketch rows → {group_key_tuple: [estimates per q]}."""
    import pandas as pd

    df = (
        sketch.to_pandas()
        if hasattr(sketch, "to_pandas")
        else pd.DataFrame(sketch)
    )
    if len(df) == 0:
        raise ValueError(
            "empty sketch: no positive finite values were sketched"
        )
    out = {}
    for key, g in df.groupby(group_cols):
        # one rank-extraction implementation: delegate per group so the
        # global and grouped estimates can never diverge
        out[key if isinstance(key, tuple) else (key,)] = dd_quantiles(
            g[["bin", "n"]], qs, rel_err
        )
    return out


# ---------------------------------------------------------------------------
# KMV / theta sketch: mergeable distinct counts WITH set operations
# ---------------------------------------------------------------------------
#
# HLL above answers "how many distinct"; it cannot answer "how many
# distinct in BOTH sources" (HLL intersection via inclusion-exclusion
# collapses for small overlaps).  The k-minimum-values sketch (Bar-Yossef
# et al. 2002; Beyer et al. 2007 for the unbiased estimator; the theta
# sketch of Dasu et al. / DataSketches generalizes it) keeps the k
# smallest hash values of the distinct-value stream.  It is mergeable
# (k smallest of a union = k smallest of the concatenated sketches) and
# supports union / intersection / Jaccard estimates across groups:
#
#     theta     = k-th smallest hash of the union, as a fraction of 2^64
#     union     ≈ (k-1) / theta
#     intersect ≈ |{v in S1 ∩ S2 : v < theta}| / theta
#
# The hash is md5 (hex16 prefix), same public-spec policy as HLL above:
# the sketch CONTENT and every estimate are exactly reproducible in SQL
# (lexicographic order on fixed-width hex = numeric order), so the whole
# operator — not a tolerance band — is oracle-checkable.
#
# Scale story: one vectorized pass emits ≤ k rows per (batch, group);
# ONE exchange on the group key reduces to the final ≤ k rows per group;
# the pairwise set-op table is computed over G × k rows (driver-bounded
# — sketches, not data).

KMV_K = 128
_TWO64 = float(2 ** 64)


def _kmv_partial_rows(groups: list, values: list[str], k: int):
    """Per-(group) k smallest distinct hex16 md5 values of ``values``."""
    import pandas as pd

    from dedup_ray.util.hashing import content_digest

    df = pd.DataFrame({"g": groups, "v": values}).drop_duplicates()
    out_g: list = []
    out_h: list[str] = []
    for g, sub in df.groupby("g", sort=False):
        dg = content_digest(sub["v"].tolist(), algo="md5")
        hv = np.unique(np.array([d[:16] for d in dg], dtype="U16"))[:k]
        out_h.extend(hv.tolist())
        out_g.extend([g] * len(hv))
    return out_g, out_h


def kmv_grouped_sketch(ds, group_col: str, token_col: str,
                       k: int = KMV_K, num_partitions: int = 8):
    """Per-group KMV sketch rows ``(group, hv)`` — the ≤ k smallest
    distinct ``substr(md5(token), 1, 16)`` values of the group."""
    from dedup_ray.util.exchange import hash_exchange

    def partial(t: pa.Table) -> pa.Table:
        g, h = _kmv_partial_rows(
            pc.cast(t[group_col], pa.string()).to_pylist(),
            pc.cast(t[token_col], pa.string()).to_pylist(), k)
        return pa.table({group_col: pa.array(g, pa.string()),
                         "hv": pa.array(h, pa.string())})

    part = ds.map_batches(partial, batch_format="pyarrow")

    def combine(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({group_col: pa.array([], pa.string()),
                             "hv": pa.array([], pa.string())})
        import pandas as pd

        df = t.select([group_col, "hv"]).to_pandas().drop_duplicates()
        df = df.sort_values([group_col, "hv"], kind="mergesort")
        df = df.groupby(group_col, sort=False).head(k)
        return pa.table({group_col: pa.array(df[group_col], pa.string()),
                         "hv": pa.array(df["hv"], pa.string())})

    return hash_exchange([part], [group_col], combine,
                         num_partitions=num_partitions)


def _hex_frac(h: str) -> float:
    return int(h, 16) / _TWO64


def kmv_set_ops(sketch_ds, group_col: str, k: int = KMV_K) -> "pa.Table":
    """Pairwise union / intersection / Jaccard estimates from per-group
    KMV sketches (``kmv_grouped_sketch`` output).  Driver-side over
    G × k sketch rows — bounded by construction, never by corpus size.

    When the merged pair has fewer than k distinct hash values, both
    sketches are COMPLETE distinct sets and the counts are exact
    (theta = 1); otherwise the standard theta-sketch estimators apply.
    Estimates are rounded to 4 decimals; the arithmetic is
    (k-1)/theta-style double division, bit-reproducible in SQL.
    """
    t = (sketch_ds if isinstance(sketch_ds, pa.Table)
         else pa.concat_tables(
             list(sketch_ds.iter_batches(batch_format="pyarrow"))
             or [pa.schema([(group_col, pa.string()),
                            ("hv", pa.string())]).empty_table()]))
    import pandas as pd

    df = t.select([group_col, "hv"]).to_pandas()
    sets = {g: set(sub["hv"]) for g, sub in df.groupby(group_col)}
    names = sorted(sets)
    rows = []
    for i, g1 in enumerate(names):
        for g2 in names[i + 1:]:
            s1, s2 = sets[g1], sets[g2]
            union_vals = np.sort(np.array(sorted(s1 | s2), dtype="U16"))
            if len(union_vals) < k:
                union_est = float(len(union_vals))
                inter_est = float(len(s1 & s2))
                jacc = inter_est / union_est if len(union_vals) else 0.0
            else:
                theta = _hex_frac(str(union_vals[k - 1]))
                below = set(union_vals[:k - 1].tolist())
                inter_n = len((s1 & s2) & below)
                union_est = (k - 1) / theta
                inter_est = inter_n / theta
                jacc = inter_n / (k - 1)
            rows.append((g1, g2, round(union_est, 4),
                         round(inter_est, 4), round(jacc, 4)))
    return pa.table({
        "g1": pa.array([r[0] for r in rows], pa.string()),
        "g2": pa.array([r[1] for r in rows], pa.string()),
        "union_est": pa.array([r[2] for r in rows], pa.float64()),
        "intersect_est": pa.array([r[3] for r in rows], pa.float64()),
        "jaccard_est": pa.array([r[4] for r in rows], pa.float64()),
    })


# ---------------------------------------------------------------------------
# Misra–Gries heavy hitters + exact rescan: EXACT frequent items at scale
# ---------------------------------------------------------------------------

def _mg_summary(tokens: np.ndarray, counts: np.ndarray, k: int):
    """Misra–Gries compression of a (token, count) multiset to ≤ k
    counters.  Classic guarantee: every item with true count > n/(k+1)
    survives with counter ≥ true − n/(k+1); merging two summaries and
    re-compressing preserves the bound (Agarwal et al. 2013), so the
    summary is a true combiner.  Vectorized: sort by count desc, keep
    the top k, subtract the (k+1)-th count from the survivors (the
    batched equivalent of the decrement-all step)."""
    if len(tokens) <= k:
        return tokens, counts
    order = np.argsort(-counts, kind="stable")
    thresh = counts[order[k]]
    keep = order[:k]
    kept = counts[keep] - thresh
    live = kept > 0
    return tokens[keep][live], kept[live]


def heavy_hitters_exact(ds, text_col: str = "text", phi: int = 1000,
                        k: int | None = None, num_partitions: int = 4):
    """EXACT tokens occurring more than n/phi times, via Misra–Gries +
    one rescan — the scalable exact-heavy-hitters recipe (CMS above
    gives ε-approximate counts; this returns the exact answer with two
    streaming passes and sketch-sized state):

    1. per-batch MG summary with k = 2·phi counters (≤ k rows emitted
       per batch regardless of batch size);
    2. one single-partition combine (sum counters, re-compress) plus a
       global token count — the candidate set is a SUPERSET of the true
       heavy hitters by the MG guarantee (k ≥ phi suffices; 2·phi gives
       slack for the merge bound);
    3. broadcast the candidate set, rescan the corpus counting ONLY
       candidates exactly, keep count > n/phi.

    Returns ``(token, cnt)`` rows, exact.  Nothing corpus-sized ever
    sits on the driver: state is O(phi) counters end to end.
    """
    import pyarrow.compute as pc

    from dedup_ray.util.exchange import hash_exchange

    if k is None:
        k = 2 * phi

    def split_tokens(t: pa.Table):
        txt = pc.coalesce(pc.cast(t[text_col], pa.string()), "")
        lists = pc.split_pattern(txt, " ")
        toks = pc.list_flatten(lists)
        toks = toks.filter(pc.not_equal(toks, ""))
        return toks

    def partial(t: pa.Table) -> pa.Table:
        toks = split_tokens(t)
        n_all = len(toks)
        vc = toks.value_counts()
        vals = np.asarray(vc.field("values").to_pylist(), dtype=object)
        cnts = vc.field("counts").to_numpy(zero_copy_only=False)
        mg_t, mg_c = _mg_summary(vals, cnts.astype(np.int64), k)
        return pa.table({
            "token": pa.array(list(mg_t) + ["\x00total"], pa.string()),
            "cnt": pa.array(list(mg_c) + [n_all], pa.int64()),
        })

    part = ds.map_batches(partial, batch_format="pyarrow")

    def combine(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        g = t.group_by("token").aggregate([("cnt", "sum")])
        toks = np.asarray(g["token"].to_pylist(), dtype=object)
        cnts = g["cnt_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        is_total = toks == "\x00total"
        mg_t, mg_c = _mg_summary(toks[~is_total], cnts[~is_total], k)
        return pa.table({
            "token": pa.array(list(mg_t) + ["\x00total"], pa.string()),
            "cnt": pa.array(list(mg_c) + [int(cnts[is_total].sum())],
                            pa.int64()),
        })

    # single gather: MG summaries are ≤ k+1 rows per batch — route them
    # all to one partition keyed on a constant
    with_key = part.map_batches(
        lambda t: t.append_column("_k", pa.array([0] * t.num_rows,
                                                 pa.int64())),
        batch_format="pyarrow")
    summary = hash_exchange([with_key], ["_k"],
                            lambda t: combine(t.drop_columns(["_k"])),
                            num_partitions=1)
    rows = summary.take_all()
    n_total = sum(r["cnt"] for r in rows if r["token"] == "\x00total")
    cand = sorted(r["token"] for r in rows if r["token"] != "\x00total")
    if not cand or n_total == 0:
        return pa.table({"token": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})

    import ray

    cand_ref = ray.put(set(cand))

    class Rescan:
        def __init__(self):
            self.cand = ray.get(cand_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            toks = split_tokens(t)
            vc = toks.value_counts()
            vals = vc.field("values").to_pylist()
            cnts = vc.field("counts").to_numpy(zero_copy_only=False)
            m = np.array([v in self.cand for v in vals], dtype=bool)
            return pa.table({
                "token": pa.array(
                    [v for v, keep in zip(vals, m) if keep], pa.string()),
                "cnt": pa.array(cnts[m].astype(np.int64), pa.int64()),
            })

    exact = ds.map_batches(Rescan, batch_format="pyarrow",
                           concurrency=num_partitions)

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        g = t.group_by("token").aggregate([("cnt", "sum")])
        cnts = g["cnt_sum"].to_numpy(zero_copy_only=False)
        keep = cnts * phi > n_total
        return pa.table({"token": g["token"].filter(pa.array(keep)),
                         "cnt": pa.array(cnts[keep], pa.int64())})

    return hash_exchange([exact], ["token"], final,
                         num_partitions=num_partitions)


# ---------------------------------------------------------------------------
# AMS / Count-Sketch F2: self-join size estimation in sketch space
# ---------------------------------------------------------------------------

AMS_D = 5    # estimator rows (median over these)
AMS_W = 256  # buckets per row = one md5 hex-digit pair


def ams_f2(ds, text_col: str = "text", num_partitions: int = 4):
    """Second frequency moment F2 = Σ_t f_t² of the token stream — the
    SELF-JOIN SIZE, the quantity a join planner needs before deciding
    broadcast vs shuffle and the skew early-warning (F2 >> n means a
    handful of hot keys dominate any key-partitioned stage).

    AMS (Alon–Matias–Szegedy 1996) in the Count-Sketch form (Charikar
    et al. 2002): row ``j`` of a d×w register matrix adds ``±f_t`` to
    bucket ``b_j(t)``; ``Σ_b reg²`` is an unbiased F2 estimate per row
    and the median over d rows concentrates.  Signs and buckets come
    from disjoint md5 slices (bucket: hex ``[2j, 2j+1]``, sign: parity
    of hex ``10+j``) — the Kirsch–Mitzenmacher device again, so every
    register AND the final median are integer-exact in SQL: this is a
    sketch whose ESTIMATE the oracle reproduces bit-for-bit.

    Registers merge by SUM: one vectorized pass emits ≤ d·w partial
    rows per batch, one exchange sums them, the estimate folds on ≤
    d·w rows.  Returns a 1-row table ``(f2_est)``.
    """
    import pyarrow.compute as pc

    from dedup_ray.util.exchange import hash_exchange
    from dedup_ray.util.hashing import content_digest

    def partial(t: pa.Table) -> pa.Table:
        txt = pc.coalesce(pc.cast(t[text_col], pa.string()), "")
        toks = pc.list_flatten(pc.split_pattern(txt, " "))
        toks = toks.filter(pc.not_equal(toks, ""))
        if len(toks) == 0:
            return pa.table({"j": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64())})
        vc = toks.value_counts()
        vals = vc.field("values").to_pylist()
        cnts = vc.field("counts").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        hx = _hex_vals(content_digest(vals), 2 * AMS_D + AMS_D + 10)
        out_j, out_b, out_v = [], [], []
        for j in range(AMS_D):
            b = hx[:, 2 * j] * 16 + hx[:, 2 * j + 1]
            sign = 1 - 2 * (hx[:, 10 + j] % 2)
            regs = np.zeros(AMS_W, np.int64)
            np.add.at(regs, b, sign * cnts)
            hit = np.flatnonzero(regs)
            out_j.extend([j] * len(hit))
            out_b.extend(hit.tolist())
            out_v.extend(regs[hit].tolist())
        return pa.table({"j": pa.array(out_j, pa.int64()),
                         "bucket": pa.array(out_b, pa.int64()),
                         "v": pa.array(out_v, pa.int64())})

    part = ds.map_batches(partial, batch_format="pyarrow")

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"f2_est": pa.array([], pa.int64())})
        g = t.group_by(["j", "bucket"]).aggregate([("v", "sum")])
        v = g["v_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        j = g["j"].to_numpy(zero_copy_only=False)
        ests = np.zeros(AMS_D, np.int64)
        np.add.at(ests, j, v * v)
        med = int(np.sort(ests)[AMS_D // 2])
        return pa.table({"f2_est": pa.array([med], pa.int64())})

    keyed = part.map_batches(
        lambda t: t.append_column("_k", pa.array([0] * t.num_rows,
                                                 pa.int64())),
        batch_format="pyarrow")
    return hash_exchange([keyed], ["_k"],
                         lambda t: fold(t.drop_columns(["_k"])),
                         num_partitions=1)
