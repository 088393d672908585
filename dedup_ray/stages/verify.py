"""Candidate-pair verification (estimated-Jaccard filter).

The reference scores each candidate pair with a trained classifier and
thresholds the probability (``classifier.py:399-411`` → threshold in
``MT_Kruskal.R``, SURVEY.md ST4).  The engine's analog is the calibrated
threshold on MinHash-estimated Jaccard: signature agreement fraction
``mean(sig1[i] == sig2[i]) >= jaccard_threshold``.

Signatures reach the pair rows through two hash-partitioned ``Dataset.join``
shuffles keyed on doc id (no broadcast of the full signature table — the
signature side is as big as the corpus).  At 10^12 docs this is the intended
plan: candidates ≪ corpus, and the joins hash-partition on the same key.
"""

from __future__ import annotations

import pyarrow as pa

from dedup_ray.config import DedupConfig
from dedup_ray.stages.minhash import unpack_signatures


from dedup_ray.util.dsutil import rename_columns as _rename


def _dedup_pairs_prep(t: pa.Table) -> pa.Table:
    """Partition-local (globally exact — the exchange co-locates every
    (id1, *) row) pair dedup, plus a narrow-column projection so chained
    ref inputs carrying extra columns (e.g. ``capped``) slim down before
    the wide signature join."""
    import pandas as pd

    if {"id1", "id2"} <= set(t.column_names):
        t = t.select(["id1", "id2"])
    mask = ~pd.DataFrame(
        {"a": t["id1"].to_pandas(), "b": t["id2"].to_pandas()}
    ).duplicated().to_numpy()
    if mask.all():
        return t
    return t.filter(pa.array(mask))


def attach_signatures(pairs_ds, sigs_ds, config: DedupConfig | None = None,
                      id_col: str = "url", id_type=None, post=None,
                      return_refs: bool = False):
    """pairs(id1,id2) ⋈ sigs on id1 ⋈ sigs on id2 → +sig1 +sig2 columns.

    Raw-exchange joins, ref-chained end to end: ``pairs_ds`` and
    ``sigs_ds`` may each be a Dataset OR a block-ref list (the output of
    a chained exchange / ``map_refs``), the two side projections are raw
    task maps off ONE set of signature refs (no per-side plan launch),
    and the id1 exchange feeds the id2 exchange by reference.  ``post``
    runs fused on each joined partition (the verifier's scoring),
    ``return_refs`` hands the raw refs to the next hop.
    """
    from dedup_ray.util.exchange import _block_refs, exchange_join, map_refs

    cfg = config or DedupConfig()
    idt = id_type if id_type is not None else pa.string()
    sig_refs = _block_refs(sigs_ds)

    def mk_side(n: int):
        def f(t: pa.Table) -> pa.Table:
            if id_col not in t.column_names:  # void block
                return t
            return pa.table({f"id{n}": t[id_col], f"sig{n}": t["sig"]})

        return f

    side1 = map_refs(sig_refs, mk_side(1))
    side2 = map_refs(sig_refs, mk_side(2))

    sig_t = pa.binary(cfg.num_perms * 8)
    joined = exchange_join(
        pairs_ds,
        side1,
        on="id1",
        num_partitions=cfg.num_partitions,
        left_prep=_dedup_pairs_prep,
        empty_schema=pa.schema(
            [("id1", idt), ("id2", idt), ("sig1", sig_t)]
        ),
        return_refs=True,  # chained straight into the id2 exchange
    )
    return exchange_join(
        joined,
        side2,
        on="id2",
        num_partitions=cfg.num_partitions,
        post=post,
        empty_schema=pa.schema(
            [
                ("id1", idt),
                ("id2", idt),
                ("sig1", sig_t),
                ("sig2", sig_t),
            ]
            if post is None
            else [("id1", idt), ("id2", idt), ("est_jaccard", pa.float64())]
        ),
        return_refs=return_refs,
    )


def estimate_jaccard(pairs_with_sigs, config: DedupConfig | None = None):
    """Append ``est_jaccard`` = signature agreement fraction (vectorized)."""
    cfg = config or DedupConfig()

    def est(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("est_jaccard", pa.array([], pa.float64()))
        s1 = unpack_signatures(batch["sig1"], cfg.num_perms)
        s2 = unpack_signatures(batch["sig2"], cfg.num_perms)
        ej = (s1 == s2).mean(axis=1)
        return batch.append_column("est_jaccard", pa.array(ej))

    return pairs_with_sigs.map_batches(est, batch_format="pyarrow")


def empty_edges(extra: dict | None = None):
    """Typed empty edge Dataset (schema survives unions/joins downstream)."""
    import ray.data

    cols = {"id1": pa.array([], pa.string()), "id2": pa.array([], pa.string())}
    for name, typ in (extra or {}).items():
        cols[name] = pa.array([], typ)
    return ray.data.from_arrow(pa.table(cols))


def verify_pairs(pairs_ds, sigs_ds, config: DedupConfig | None = None,
                 id_col: str = "url", id_type=None,
                 return_refs: bool = False):
    """Candidates → accepted edges (id1, id2, est_jaccard >= threshold).

    One chained hop: the estimated-Jaccard scoring and threshold filter
    run FUSED into the second signature join's reduce (``post``), so the
    whole candidates → accepted-edges path is two pipelined exchange
    waves with no intermediate plan execution.  ``pairs_ds`` / ``sigs_ds``
    may be Datasets or chained block-ref lists; a zero-candidate corpus
    needs no materialize-and-count short-circuit — empty partitions merge
    to empty tables with the schema pinned by ``empty_schema``.
    """
    cfg = config or DedupConfig()
    if cfg.verify == "none":
        import ray.data

        if isinstance(pairs_ds, list):
            pairs_ds = ray.data.from_arrow_refs(pairs_ds)
        return pairs_ds.select_columns(["id1", "id2"])
    thr = cfg.jaccard_threshold
    n_perms = cfg.num_perms

    def score_and_cut(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if batch.num_rows == 0:
            return pa.table({
                "id1": pa.array([], batch["id1"].type if "id1" in
                                batch.column_names else pa.string()),
                "id2": pa.array([], batch["id2"].type if "id2" in
                                batch.column_names else pa.string()),
                "est_jaccard": pa.array([], pa.float64()),
            })
        s1 = unpack_signatures(batch["sig1"], n_perms)
        s2 = unpack_signatures(batch["sig2"], n_perms)
        ej = (s1 == s2).mean(axis=1)
        out = pa.table({
            "id1": batch["id1"],
            "id2": batch["id2"],
            "est_jaccard": pa.array(ej),
        })
        return out.filter(pc.greater_equal(out["est_jaccard"], thr))

    return attach_signatures(
        pairs_ds, sigs_ds, cfg, id_col, id_type=id_type,
        post=score_and_cut, return_refs=return_refs,
    )
