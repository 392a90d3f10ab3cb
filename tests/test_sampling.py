import numpy as np
import jax
import jax.numpy as jnp

from instance_nerf_tpu.ops.sampling import (
    BELOW_LOW_THRESHOLD,
    BETWEEN_THRESHOLDS,
    balanced_sample,
    match_proposals,
)


def test_matcher_thresholds():
    # 2 gt x 4 predictions
    q = jnp.asarray(
        [
            [0.9, 0.4, 0.1, 0.0],
            [0.2, 0.6, 0.2, 0.05],
        ]
    )
    m = np.asarray(match_proposals(q, high_threshold=0.5, low_threshold=0.3))
    assert m.tolist() == [0, 1, BELOW_LOW_THRESHOLD, BELOW_LOW_THRESHOLD]

    m2 = np.asarray(match_proposals(q, high_threshold=0.7, low_threshold=0.3))
    assert m2.tolist() == [0, BETWEEN_THRESHOLDS, BELOW_LOW_THRESHOLD, BELOW_LOW_THRESHOLD]


def test_matcher_low_quality_recovery():
    # gt 1's best pred (index 2, 0.25) is below low threshold; recovery
    # restores it, ties included.
    q = jnp.asarray(
        [
            [0.9, 0.1, 0.05, 0.0],
            [0.1, 0.2, 0.25, 0.25],
        ]
    )
    m = np.asarray(
        match_proposals(q, 0.5, 0.3, allow_low_quality_matches=True)
    )
    assert m[0] == 0
    assert m[2] == 1 and m[3] == 1  # both ties restored
    assert m[1] == BELOW_LOW_THRESHOLD


def test_matcher_gt_valid_mask():
    q = jnp.asarray(
        [
            [0.9, 0.9],
            [0.95, 0.1],
        ]
    )
    gt_valid = jnp.asarray([True, False])
    m = np.asarray(match_proposals(q, 0.5, 0.3, gt_valid=gt_valid))
    assert m.tolist() == [0, 0]  # padded gt row 1 never matches


def test_balanced_sampler_counts():
    rng = np.random.default_rng(0)
    matched = jnp.asarray(rng.choice([-1, 0, 1, 2], size=200, p=[0.1, 0.6, 0.2, 0.1]))
    res = balanced_sample(jax.random.key(0), matched, 64, 0.25)
    pos = np.asarray(res.pos_mask)
    neg = np.asarray(res.neg_mask)
    assert pos.sum() == min(16, int((np.asarray(matched) >= 1).sum()))
    assert pos.sum() + neg.sum() <= 64
    assert not (pos & neg).any()
    # positives only from positive pool
    assert (np.asarray(matched)[pos] >= 1).all()
    assert (np.asarray(matched)[neg] == 0).all()


def test_balanced_sampler_scarce_positives():
    matched = jnp.asarray([1] * 3 + [0] * 100)
    res = balanced_sample(jax.random.key(1), matched, 64, 0.25)
    assert np.asarray(res.pos_mask).sum() == 3
    assert np.asarray(res.neg_mask).sum() == 61


def test_balanced_sampler_randomness():
    matched = jnp.asarray([0] * 100)
    r1 = balanced_sample(jax.random.key(0), matched, 10, 0.5)
    r2 = balanced_sample(jax.random.key(1), matched, 10, 0.5)
    assert not np.array_equal(np.asarray(r1.neg_mask), np.asarray(r2.neg_mask))
    assert np.asarray(r1.neg_mask).sum() == 10


def test_balanced_sampler_jits():
    matched = jnp.asarray([1] * 10 + [0] * 90)
    f = jax.jit(lambda k, m: balanced_sample(k, m, 32, 0.25))
    res = f(jax.random.key(2), matched)
    assert np.asarray(res.pos_mask).sum() == 8
