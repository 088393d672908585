"""Extension surface: registered pair-feature transforms (SURVEY §2.12)."""

from dedup_ray.functions.pairfeatures import (  # noqa: F401
    PAIR_FEATURES,
    PairFeature,
    apply_pair_features,
    make_feature,
    register_pair_feature,
)
