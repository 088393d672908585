"""Sequence packing (distributed prefix scan) vs a driver brute force."""

import numpy as np
import pyarrow as pa

import ray.data

from dedup_ray.stages.packing import pack_sequences, token_counts


def _mkcounts(ntoks):
    return ray.data.from_arrow(
        pa.table({
            "doc_id": pa.array(range(len(ntoks)), pa.int64()),
            "n_tokens": pa.array(ntoks, pa.int64()),
        })
    )


def _brute(ntoks, budget):
    before = np.r_[0, np.cumsum(ntoks)[:-1]]
    return before // budget, before % budget


def test_pack_matches_brute_force_across_buckets():
    rng = np.random.default_rng(3)
    ntoks = rng.integers(1, 90, 200).tolist()
    out = pack_sequences(
        _mkcounts(ntoks), budget=128, bucket_width=16, num_partitions=4
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    seq, off = _brute(np.array(ntoks), 128)
    assert out.seq_id.tolist() == seq.tolist()
    assert out.seq_offset.tolist() == off.tolist()
    assert out.n_tokens.tolist() == ntoks


def test_pack_doc_straddles_budget_boundary():
    # 100 + 100 tokens: second doc starts at offset 100 of seq 0, third
    # (huge) doc starts in seq 1 and swallows several budgets
    ntoks = [100, 100, 1000, 10]
    out = pack_sequences(
        _mkcounts(ntoks), budget=128, bucket_width=2, num_partitions=2
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out.seq_id.tolist() == [0, 0, 1, 9]
    assert out.seq_offset.tolist() == [0, 100, 200 - 128, 1200 % 128]


def test_token_counts_plain_split():
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["a b c", "x"], pa.string())})
    )
    out = token_counts(ds).to_pandas().sort_values("doc_id")
    assert out.n_tokens.tolist() == [3, 1]
