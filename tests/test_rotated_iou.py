import numpy as np
import jax
import jax.numpy as jnp

from instance_nerf_tpu.ops import rotated_iou as R


def rasterized_iou_3d(box1, box2, res=160):
    """Brute-force voxel-sampling IoU for z-yaw OBBs (golden reference)."""

    def inside(pts, box):
        x, y, z, w, l, h, t = box
        dx, dy, dz = pts[:, 0] - x, pts[:, 1] - y, pts[:, 2] - z
        c, s = np.cos(-t), np.sin(-t)
        lx = dx * c - dy * s
        ly = dx * s + dy * c
        return (
            (np.abs(lx) <= w / 2) & (np.abs(ly) <= l / 2) & (np.abs(dz) <= h / 2)
        )

    lo = np.minimum(
        np.array(box1[:3]) - np.abs(box1[3:6]).sum(),
        np.array(box2[:3]) - np.abs(box2[3:6]).sum(),
    )
    hi = np.maximum(
        np.array(box1[:3]) + np.abs(box1[3:6]).sum(),
        np.array(box2[:3]) + np.abs(box2[3:6]).sum(),
    )
    axes = [np.linspace(lo[i], hi[i], res) for i in range(3)]
    pts = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, 3)
    in1, in2 = inside(pts, box1), inside(pts, box2)
    inter = np.sum(in1 & in2)
    union = np.sum(in1 | in2)
    return inter / union if union else 0.0


def test_identical_boxes():
    b = jnp.asarray([[1.0, 2.0, 3.0, 4.0, 2.0, 5.0, 0.7]])
    iou = np.asarray(R.cal_iou_3d(b, b))
    np.testing.assert_allclose(iou, 1.0, atol=1e-5)


def test_disjoint_boxes():
    b1 = jnp.asarray([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.3]])
    b2 = jnp.asarray([[10.0, 10.0, 10.0, 2.0, 2.0, 2.0, 1.0]])
    iou = np.asarray(R.cal_iou_3d(b1, b2))
    np.testing.assert_allclose(iou, 0.0, atol=1e-6)


def test_axis_aligned_analytic():
    # 2x2x2 box overlapping 2x2x2 box shifted by (1,1,1): inter=1, union=15
    b1 = jnp.asarray([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]])
    b2 = jnp.asarray([[1.0, 1.0, 1.0, 2.0, 2.0, 2.0, 0.0]])
    iou = np.asarray(R.cal_iou_3d(b1, b2))
    np.testing.assert_allclose(iou, 1.0 / 15.0, rtol=1e-5)


def test_rotated_45_analytic():
    # unit square vs itself rotated 45deg about center: inter = 2*(sqrt(2)-1)
    b1 = jnp.asarray([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0]])
    b2 = jnp.asarray([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0, np.pi / 4]])
    inter_2d = 2 * (np.sqrt(2) - 1)
    want = inter_2d / (2 - inter_2d)
    iou = np.asarray(R.cal_iou_3d(b1, b2))
    np.testing.assert_allclose(iou, want, rtol=1e-4)


def test_random_vs_rasterized():
    rng = np.random.default_rng(42)
    pairs = []
    for _ in range(8):
        c1 = rng.uniform(-1, 1, 3)
        c2 = c1 + rng.uniform(-1.5, 1.5, 3)
        s1 = rng.uniform(1.0, 3.0, 3)
        s2 = rng.uniform(1.0, 3.0, 3)
        t1, t2 = rng.uniform(-np.pi / 2, np.pi / 2, 2)
        pairs.append((np.r_[c1, s1, t1], np.r_[c2, s2, t2]))
    b1 = jnp.asarray([p[0] for p in pairs], jnp.float32)
    b2 = jnp.asarray([p[1] for p in pairs], jnp.float32)
    got = np.asarray(R.cal_iou_3d(b1, b2))
    want = np.array([rasterized_iou_3d(p[0], p[1], res=120) for p in pairs])
    np.testing.assert_allclose(got, want, atol=0.02)


def test_batched_broadcasting():
    rng = np.random.default_rng(3)
    b1 = jnp.asarray(rng.uniform(1, 3, (2, 4, 7)), jnp.float32)
    out = R.cal_iou_3d(b1, b1)
    assert out.shape == (2, 4)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-4)


def test_giou_identical_is_zero_loss():
    b = jnp.asarray([[0.0, 0.0, 0.0, 2.0, 1.0, 1.0, 0.4]])
    loss, giou, iou = R.cal_giou_3d(b, b)
    np.testing.assert_allclose(np.asarray(loss), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(iou), 1.0, atol=1e-4)


def test_giou_gradients_finite():
    b1 = jnp.asarray([[0.0, 0.0, 0.0, 2.0, 1.0, 1.0, 0.3]])
    b2 = jnp.asarray([[0.5, 0.2, 0.1, 1.5, 1.2, 0.8, -0.2]])

    def loss_fn(b):
        loss, _, _ = R.cal_giou_3d(b, b2)
        return jnp.sum(loss)

    g = jax.grad(loss_fn)(b1)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_diou_3d_runs():
    b1 = jnp.asarray([[0.0, 0.0, 0.0, 2.0, 1.0, 1.0, 0.3]])
    b2 = jnp.asarray([[0.5, 0.2, 0.1, 1.5, 1.2, 0.8, -0.2]])
    loss, iou = R.cal_diou_3d(b1, b2)
    assert np.isfinite(np.asarray(loss)).all()


def test_smallest_enclosing_box_contains_both():
    rng = np.random.default_rng(7)
    b1 = jnp.asarray(rng.uniform(1, 3, (5, 5)), jnp.float32)
    b2 = jnp.asarray(rng.uniform(1, 3, (5, 5)), jnp.float32)
    c1, c2 = R.box2corners(b1), R.box2corners(b2)
    w, h = R.smallest_bounding_box(c1, c2)
    wa, ha = R.enclosing_box_aligned(c1, c2)
    # smallest enclosing area <= axis-aligned enclosing area
    assert (np.asarray(w * h) <= np.asarray(wa * ha) + 1e-4).all()


def test_aabb2obb_canonical():
    aabb = jnp.asarray([[0.0, 0.0, 0.0, 2.0, 6.0, 4.0]])
    obb = np.asarray(R.aabb2obb_3d(aabb))[0]
    np.testing.assert_allclose(obb[:3], [1, 3, 2], atol=1e-6)
    np.testing.assert_allclose(obb[3:6], [6, 2, 4], atol=1e-6)  # w >= l
    np.testing.assert_allclose(obb[6], np.pi / 2, atol=1e-6)


def test_iou_bounded_for_garbage_boxes():
    """Regression (round 4): early-training proposals with extreme
    sizes/angles made oriented_box_intersection_2d emit far-away
    candidate vertices whose shoelace area dwarfed the union -> IoU 5e5
    through the inter/EPS path. The convexity bound (inter <= min vol)
    must keep IoU in [0, 1] for ANY input, incl. non-positive sizes."""
    rng = np.random.default_rng(0)
    n = 256
    b1 = np.stack([
        rng.uniform(-50, 50, n), rng.uniform(-50, 50, n),
        rng.uniform(-50, 50, n),
        rng.uniform(-2, 200, n), rng.uniform(-2, 200, n),
        rng.uniform(-2, 200, n), rng.uniform(-20, 20, n),
    ], axis=-1).astype(np.float32)
    b2 = b1[rng.permutation(n)] + rng.normal(0, 5, (n, 7)).astype(np.float32)
    # sprinkle exact zeros and near-parallel duplicates
    b1[:8, 3:6] = 0.0
    b2[8:16] = b1[8:16]
    iou = np.asarray(R.cal_iou_3d(jnp.asarray(b1), jnp.asarray(b2)))
    assert np.isfinite(iou).all()
    assert (iou >= 0.0).all() and (iou <= 1.0 + 1e-5).all(), iou.max()
    iou2d, *_ = R.cal_iou(jnp.asarray(b1[:, [0, 1, 3, 4, 6]]),
                          jnp.asarray(b2[:, [0, 1, 3, 4, 6]]))
    iou2d = np.asarray(iou2d)
    assert np.isfinite(iou2d).all()
    assert (iou2d >= 0.0).all() and (iou2d <= 1.0 + 1e-5).all()


def test_self_iou_is_one_across_thetas():
    """Regression: fp32 rounding of rotated corners made on-boundary
    corners fail the inside test at tol=1e-6, returning self-IoU = 1/3
    for ~5% of boxes — a spurious barrier at the optimum of the
    -log(IoU) OBB reg loss (round-5 theta-plateau root cause)."""
    rng = np.random.default_rng(7)
    n = 500
    c = rng.uniform(30, 90, (n, 3))
    wl = rng.uniform(8, 40, (n, 2))
    h = rng.uniform(8, 40, (n, 1))
    th = rng.uniform(-np.pi / 2, np.pi / 2, (n, 1))
    boxes = jnp.asarray(np.concatenate([c, wl, h, th], -1), jnp.float32)
    iou = np.asarray(R.cal_iou_3d(boxes[:, None, :], boxes[:, None, :]))[:, 0]
    assert iou.min() > 0.999, float(iou.min())
    # and at unit scale
    small = boxes.at[:, :6].multiply(0.01)
    ious = np.asarray(R.cal_iou_3d(small[:, None, :], small[:, None, :]))[:, 0]
    assert ious.min() > 0.999, float(ious.min())
