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


def attach_signatures(pairs_ds, sigs_ds, config: DedupConfig | None = None,
                      id_col: str = "url", id_type=None):
    """pairs(id1,id2) ⋈ sigs on id1 ⋈ sigs on id2 → +sig1 +sig2 columns.

    Uses :func:`dedup_ray.util.dsutil.hash_join` (task-based co-partition
    shuffle) rather than ``Dataset.join`` so several verify paths can fuse
    into one streaming plan without aggregator-actor CPU starvation.
    """
    from dedup_ray.util.exchange import exchange_join

    cfg = config or DedupConfig()
    idt = id_type if id_type is not None else pa.string()
    side1 = _rename(sigs_ds.select_columns([id_col, "sig"]), {id_col: "id1", "sig": "sig1"})
    side2 = _rename(sigs_ds.select_columns([id_col, "sig"]), {id_col: "id2", "sig": "sig2"})

    def dedup_pairs(t: pa.Table) -> pa.Table:
        # cross-band duplicate pairs dedup here for free: the exchange
        # co-locates every (id1, *) row, so a partition-local pair dedup is
        # globally exact — no dedicated dedup shuffle.  Narrow columns only.
        import pandas as pd

        mask = ~pd.DataFrame(
            {"a": t["id1"].to_pandas(), "b": t["id2"].to_pandas()}
        ).duplicated().to_numpy()
        if mask.all():
            return t
        return t.filter(pa.array(mask))

    sig_t = pa.binary(cfg.num_perms * 8)
    joined = exchange_join(
        pairs_ds.select_columns(["id1", "id2"]),
        side1,
        on="id1",
        num_partitions=cfg.num_partitions,
        left_prep=dedup_pairs,
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
        empty_schema=pa.schema(
            [
                ("id1", idt),
                ("id2", idt),
                ("sig1", sig_t),
                ("sig2", sig_t),
            ]
        ),
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
                 id_col: str = "url", id_type=None):
    """Candidates → accepted edges (id1, id2, est_jaccard >= threshold).

    Fully streaming: ``hash_join`` takes explicit column lists, so a
    zero-candidate corpus needs no materialize-and-count short-circuit —
    empty partitions merge to empty frames and the schema is pinned
    downstream.
    """
    cfg = config or DedupConfig()
    if cfg.verify == "none":
        return pairs_ds.select_columns(["id1", "id2"])
    scored = estimate_jaccard(
        attach_signatures(pairs_ds, sigs_ds, cfg, id_col, id_type=id_type), cfg
    )
    thr = cfg.jaccard_threshold

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out = batch.filter(pc.greater_equal(batch["est_jaccard"], thr))
        return out.select(["id1", "id2", "est_jaccard"])

    return scored.map_batches(keep, batch_format="pyarrow")
