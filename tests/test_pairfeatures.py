"""PairFeature registry: composition, requires-validation, built-ins."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from dedup_ray.functions import (
    PAIR_FEATURES,
    apply_pair_features,
    make_feature,
    register_pair_feature,
)


def test_builtin_composition_fused():
    df = pd.DataFrame(
        {
            "id1": ["a", "b"],
            "id2": ["c", "d"],
            "n_chars1": [100, 40],
            "n_chars2": [50, 40],
            "fp1": np.array([0b1111, 0], dtype=np.int64),
            "fp2": np.array([0b1001, 0], dtype=np.int64),
        }
    )
    out = apply_pair_features(
        rd.from_pandas(df), ["len_ratio", "simhash_hamming"]
    ).to_pandas()
    assert list(out["len_ratio"]) == [0.5, 1.0]
    assert list(out["hamming"]) == [2, 0]


def test_requires_validation_raises_clearly():
    df = pd.DataFrame({"id1": ["a"], "id2": ["b"]})
    with pytest.raises(Exception, match="len_ratio.*requires"):
        apply_pair_features(rd.from_pandas(df), ["len_ratio"]).materialize()


def test_register_custom_feature_chains_on_provides():
    @register_pair_feature("double_ratio", requires=("len_ratio",),
                           provides=("double_ratio",))
    def double_ratio(batch: pa.Table) -> pa.Table:
        r = batch["len_ratio"].to_numpy(zero_copy_only=False) * 2
        return batch.append_column("double_ratio", pa.array(r))

    df = pd.DataFrame(
        {"id1": ["a"], "id2": ["b"], "n_chars1": [10], "n_chars2": [20]}
    )
    out = apply_pair_features(
        rd.from_pandas(df), ["len_ratio", "double_ratio"]
    ).to_pandas()
    assert out["double_ratio"].iloc[0] == 1.0
    del PAIR_FEATURES["double_ratio"]


def test_est_jaccard_feature_matches_verify_semantics():
    from dedup_ray.stages.minhash import pack_signatures

    sigs = np.array(
        [[1, 2, 3, 4], [1, 2, 9, 9]], dtype=np.uint64
    )
    packed = pack_signatures(sigs)
    df = pa.table(
        {
            "id1": pa.array(["a"]),
            "id2": pa.array(["b"]),
            "sig1": packed.take(pa.array([0])),
            "sig2": packed.take(pa.array([1])),
        }
    )
    out = apply_pair_features(
        rd.from_arrow(df), [make_feature("est_jaccard", num_perms=4)]
    ).to_pandas()
    assert out["est_jaccard"].iloc[0] == 0.5
