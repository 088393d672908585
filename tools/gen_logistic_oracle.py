"""Regenerate the pinned DuckDB oracle for ``logistic_score_embeddings``.

The trainer (``dedup_ray.stages.classifier.train_logistic``) is zero-RNG
full-batch gradient descent, so its weights are a deterministic function of
the embeddings table.  This prints the oracle SQL with the
standardization-folded weights (w/std, b − mean·w/std) as literals; paste it
over ``ORACLES["logistic_score_embeddings"]`` in
``dedup_ray/pipelines/queries.py`` after any trainer change.

Usage: PYTHONPATH=/root/repo python tools/gen_logistic_oracle.py [sf_dir]
"""

import sys

import numpy as np
import pyarrow.parquet as pq

from dedup_ray.stages.classifier import train_logistic


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["embedding", "label"]
    ).to_pandas()
    X = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    y = (t["label"].to_numpy() < 5).astype(np.float64)
    m = train_logistic(X, y)
    weff = m["w"] / m["std"]
    beff = float(m["b"] - float((m["mean"] / m["std"]) @ m["w"]))
    wlist = ", ".join(repr(float(v)) for v in weff)
    print(
        f"""
        SELECT vec_id,
               round(1.0 / (1.0 + exp(-(list_dot_product(
                   CAST(embedding AS DOUBLE[]), [{wlist}]) + ({beff!r})))), 6)
                   AS score,
               CAST(1.0 / (1.0 + exp(-(list_dot_product(
                   CAST(embedding AS DOUBLE[]), [{wlist}]) + ({beff!r})))) >= 0.5
                   AS BIGINT) AS pred
        FROM embeddings
    """
    )


if __name__ == "__main__":
    main()
