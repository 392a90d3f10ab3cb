import numpy as np
import jax.numpy as jnp

from instance_nerf_tpu.ops import boxes as B


def ref_iou_aabb(b1, b2):
    v1 = np.prod(b1[3:] - b1[:3])
    v2 = np.prod(b2[3:] - b2[:3])
    lt = np.maximum(b1[:3], b2[:3])
    rb = np.minimum(b1[3:], b2[3:])
    whd = np.clip(rb - lt, 0, None)
    inter = np.prod(whd)
    return inter / (v1 + v2 - inter)


def random_aabbs(rng, n, size=100.0):
    lo = rng.uniform(0, size * 0.7, (n, 3))
    whd = rng.uniform(1.0, size * 0.3, (n, 3))
    return np.concatenate([lo, lo + whd], axis=1).astype(np.float32)


def test_box_iou_3d_matches_bruteforce():
    rng = np.random.default_rng(0)
    b1 = random_aabbs(rng, 7)
    b2 = random_aabbs(rng, 5)
    got = np.asarray(B.box_iou_3d(jnp.asarray(b1), jnp.asarray(b2)))
    want = np.array([[ref_iou_aabb(x, y) for y in b2] for x in b1])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_iou_identity_and_disjoint():
    b = jnp.asarray([[0, 0, 0, 10, 10, 10], [20, 20, 20, 30, 30, 30]], jnp.float32)
    iou = np.asarray(B.box_iou_3d(b, b))
    np.testing.assert_allclose(iou, np.eye(2), atol=1e-6)


def test_iou_zero_volume_padded_box_is_safe():
    b1 = jnp.asarray([[0, 0, 0, 0, 0, 0]], jnp.float32)  # padded/degenerate
    b2 = jnp.asarray([[0, 0, 0, 5, 5, 5]], jnp.float32)
    iou = np.asarray(B.box_iou_3d(b1, b2))
    assert np.isfinite(iou).all()
    assert iou[0, 0] == 0.0


def test_clip_boxes_to_mesh():
    b = jnp.asarray([[-5, -5, -5, 200, 50, 50]], jnp.float32)
    out = np.asarray(B.clip_boxes_to_mesh(b, (100, 100, 100)))
    np.testing.assert_allclose(out, [[0, 0, 0, 100, 50, 50]])


def test_small_box_mask():
    b = jnp.asarray(
        [[0, 0, 0, 10, 10, 10], [0, 0, 0, 10, 10, 0.5]], jnp.float32
    )
    m = np.asarray(B.small_box_mask(b, 1.0))
    assert m.tolist() == [True, False]


def test_obb2hbb_3d_axis_aligned():
    obb = jnp.asarray([[5.0, 5.0, 5.0, 4.0, 2.0, 6.0, 0.0]])
    hbb = np.asarray(B.obb2hbb_3d(obb))
    np.testing.assert_allclose(hbb, [[3, 4, 2, 7, 6, 8]], atol=1e-6)


def test_obb2hbb_3d_rotated_90():
    obb = jnp.asarray([[0.0, 0.0, 0.0, 4.0, 2.0, 6.0, np.pi / 2]])
    hbb = np.asarray(B.obb2hbb_3d(obb))
    np.testing.assert_allclose(hbb, [[-1, -2, -3, 1, 2, 3]], atol=1e-5)


def test_obb2poly_3d_corners():
    obb = jnp.asarray([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]])
    poly = np.asarray(B.obb2poly_3d(obb)).reshape(8, 3)
    # all corners at distance sqrt(3) from origin
    np.testing.assert_allclose(np.linalg.norm(poly, axis=1), np.sqrt(3), atol=1e-5)
    assert sorted(poly[:, 2].tolist()) == [-1, -1, -1, -1, 1, 1, 1, 1]


def test_rectpoly2obb_roundtrip():
    rng = np.random.default_rng(1)
    for _ in range(10):
        x, y = rng.uniform(-5, 5, 2)
        w, h = rng.uniform(2, 6), rng.uniform(0.5, 1.5)
        t = rng.uniform(-np.pi / 2 + 0.05, np.pi / 2 - 0.05)
        obb = jnp.asarray([[x, y, max(w, h), min(w, h), t]], jnp.float32)
        poly = B.obb2poly(obb)
        back = np.asarray(B.rectpoly2obb(poly))[0]
        np.testing.assert_allclose(back[:2], [x, y], atol=1e-4)
        np.testing.assert_allclose(sorted(back[2:4]), sorted([w, h]), atol=1e-4)


def test_regular_theta():
    t = jnp.asarray([np.pi * 0.75, -np.pi * 0.75, 0.1])
    out = np.asarray(B.regular_theta(t))
    assert (out >= -np.pi / 2).all() and (out < np.pi / 2).all()
