import numpy as np
import jax.numpy as jnp

from instance_nerf_tpu.ops.coders import AABBCoder, MidpointOffsetCoder
from tests.test_boxes import random_aabbs


def test_aabb_coder_roundtrip():
    rng = np.random.default_rng(0)
    props = jnp.asarray(random_aabbs(rng, 12))
    gts = jnp.asarray(random_aabbs(rng, 12))
    coder = AABBCoder()
    deltas = coder.encode(gts, props)
    decoded = coder.decode(deltas, props)
    np.testing.assert_allclose(np.asarray(decoded), np.asarray(gts), rtol=1e-4, atol=1e-3)


def test_aabb_coder_zero_delta_identity():
    rng = np.random.default_rng(1)
    props = jnp.asarray(random_aabbs(rng, 5))
    coder = AABBCoder()
    decoded = coder.decode(jnp.zeros((5, 6)), props)
    np.testing.assert_allclose(np.asarray(decoded), np.asarray(props), rtol=1e-5)


def test_aabb_coder_clip_prevents_explosion():
    coder = AABBCoder()
    props = jnp.asarray([[0, 0, 0, 10, 10, 10]], jnp.float32)
    deltas = jnp.asarray([[0, 0, 0, 100, 100, 100]], jnp.float32)
    out = np.asarray(coder.decode(deltas, props))
    assert np.isfinite(out).all()


def test_midpoint_offset_roundtrip():
    """encode→decode recovers the gt OBB (up to w/l + theta canonicalization)."""
    rng = np.random.default_rng(2)
    coder = MidpointOffsetCoder()
    for _ in range(10):
        c = rng.uniform(10, 50, 3)
        wlh = rng.uniform(4, 10, 3)
        # keep w > l so canonical form is unambiguous; theta away from edges
        w, l = max(wlh[0], wlh[1]) + 1.0, min(wlh[0], wlh[1])
        t = rng.uniform(-np.pi / 4 + 0.1, np.pi / 4 - 0.1)
        gt = jnp.asarray([[c[0], c[1], c[2], w, l, wlh[2], t]], jnp.float32)
        anchor = jnp.asarray(
            [[c[0] - 5, c[1] - 5, c[2] - 5, c[0] + 5, c[1] + 5, c[2] + 5]],
            jnp.float32,
        )
        deltas = coder.encode(gt, anchor)
        dec = np.asarray(coder.decode(deltas, anchor))[0]
        np.testing.assert_allclose(dec[:3], np.asarray(gt)[0, :3], atol=1e-2)
        np.testing.assert_allclose(
            sorted(dec[3:5]), sorted(np.asarray(gt)[0, 3:5]), rtol=0.05
        )
        np.testing.assert_allclose(dec[5], wlh[2], atol=1e-2)


def test_midpoint_offset_axis_aligned_gt():
    coder = MidpointOffsetCoder()
    gt = jnp.asarray([[10.0, 10.0, 10.0, 8.0, 4.0, 6.0, 0.0]])
    anchor = jnp.asarray([[6.0, 8.0, 7.0, 14.0, 12.0, 13.0]])
    deltas = coder.encode(gt, anchor)
    assert np.isfinite(np.asarray(deltas)).all()
    dec = np.asarray(coder.decode(deltas, anchor))[0]
    np.testing.assert_allclose(dec[:6], [10, 10, 10, 8, 4, 6], atol=0.05)


def test_rotated_coder_roundtrip():
    from instance_nerf_tpu.ops.coders import RotatedCoder

    rng = np.random.default_rng(5)
    coder = RotatedCoder()
    anchors = jnp.asarray(
        np.concatenate(
            [
                rng.uniform(10, 50, (8, 3)),
                rng.uniform(4, 10, (8, 3)),
                rng.uniform(-0.6, 0.6, (8, 1)),
            ],
            axis=1,
        ),
        jnp.float32,
    )
    gts = jnp.asarray(
        np.concatenate(
            [
                rng.uniform(10, 50, (8, 3)),
                rng.uniform(4, 10, (8, 3)),
                rng.uniform(-0.6, 0.6, (8, 1)),
            ],
            axis=1,
        ),
        jnp.float32,
    )
    deltas = coder.encode(gts, anchors)
    dec = np.asarray(coder.decode(deltas, anchors))
    np.testing.assert_allclose(dec[:, :6], np.asarray(gts)[:, :6], rtol=1e-4, atol=1e-3)
    # angle wrapped into [-pi/2, pi/2)
    np.testing.assert_allclose(dec[:, 6], np.asarray(gts)[:, 6], atol=1e-4)
