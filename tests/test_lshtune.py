"""LSH S-curve tuner: known anchors, monotonicity, budget discipline."""

import pytest

from dedup_ray.functions.lshtune import (
    collision_probability,
    config_recall_at,
    curve_threshold,
    optimal_bands_rows,
)


def test_s_curve_anchors():
    # single band, single row: P(s) = s
    assert collision_probability(0.3, 1, 1) == pytest.approx(0.3)
    # midpoint approximation: P(curve_threshold) is mid-curve, not extreme
    for b, r in [(32, 4), (16, 8), (8, 16)]:
        p = collision_probability(curve_threshold(b, r), b, r)
        assert 0.4 < p < 0.75


def test_monotone_in_similarity_and_bands():
    ps = [collision_probability(s / 10, 32, 4) for s in range(11)]
    assert ps == sorted(ps)
    # more bands at fixed rows can only raise collision probability
    assert collision_probability(0.5, 64, 4) > collision_probability(0.5, 8, 4)


def test_optimal_params_track_threshold():
    lo = optimal_bands_rows(0.3, 128)
    hi = optimal_bands_rows(0.9, 128)
    # higher threshold => steeper curve further right => more rows per band
    assert hi.rows > lo.rows
    assert lo.num_perms <= 128 and hi.num_perms <= 128
    # the chosen curve's midpoint lands near the requested threshold
    assert abs(curve_threshold(lo.bands, lo.rows) - 0.3) < 0.15
    assert abs(curve_threshold(hi.bands, hi.rows) - 0.9) < 0.1


def test_weights_trade_fp_for_fn():
    fp_averse = optimal_bands_rows(0.5, 128, fp_weight=0.9, fn_weight=0.1)
    fn_averse = optimal_bands_rows(0.5, 128, fp_weight=0.1, fn_weight=0.9)
    assert fp_averse.fp_mass <= fn_averse.fp_mass
    assert fn_averse.fn_mass <= fp_averse.fn_mass


def test_engine_default_config_is_sane():
    # the engine's shipped defaults: 32 bands x 4 rows at tau=0.5 must
    # propose essentially every pair at the acceptance threshold
    assert config_recall_at(0.5, 32, 4) > 0.85


def test_config_tuned_constructor():
    from dedup_ray.config import DedupConfig

    cfg = DedupConfig.tuned(0.5, 128, minhash_concurrency=2)
    assert cfg.num_perms % cfg.bands == 0
    assert cfg.num_perms <= 128
    assert cfg.jaccard_threshold == 0.5
    assert cfg.minhash_concurrency == 2
    # balanced weights put the S-curve midpoint AT the threshold
    from dedup_ray.functions.lshtune import collision_probability

    p_mid = collision_probability(0.5, cfg.bands, cfg.rows_per_band)
    assert 0.3 < p_mid < 0.8
    # recall-leaning weights push the curve left: higher P at the threshold
    recall_cfg = DedupConfig.tuned(0.5, 128, fp_weight=0.1, fn_weight=0.9)
    assert collision_probability(
        0.5, recall_cfg.bands, recall_cfg.rows_per_band
    ) > p_mid
