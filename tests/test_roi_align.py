import numpy as np
import jax
import jax.numpy as jnp

from instance_nerf_tpu.ops.roi_align import project_masks_on_boxes, roi_align_3d


def numpy_roi_align(feats, roi, out_size, scale=1.0, s=1):
    """Brute-force single-roi reference (channels-last, aligned=False)."""
    w, l, h, c = feats.shape
    ow, ol, oh = out_size
    lo = np.asarray(roi[:3]) * scale
    hi = np.asarray(roi[3:]) * scale
    bins = (hi - lo) / np.array([ow, ol, oh])
    out = np.zeros((ow, ol, oh, c))

    def sample(p, size, axis_vals):
        if p < -1 or p > size:
            return np.zeros(c)
        p = np.clip(p, 0, size - 1)
        i0 = int(np.floor(p))
        i1 = min(i0 + 1, size - 1)
        f = p - i0
        return axis_vals(i0) * (1 - f) + axis_vals(i1) * f

    for i in range(ow):
        for j in range(ol):
            for k in range(oh):
                acc = np.zeros(c)
                for si in range(s):
                    for sj in range(s):
                        for sk in range(s):
                            px = lo[0] + (i + (si + 0.5) / s) * bins[0]
                            py = lo[1] + (j + (sj + 0.5) / s) * bins[1]
                            pz = lo[2] + (k + (sk + 0.5) / s) * bins[2]
                            acc += sample(
                                px,
                                w,
                                lambda x: sample(
                                    py,
                                    l,
                                    lambda y: sample(pz, h, lambda z: feats[x, y, z]),
                                ),
                            )
                out[i, j, k] = acc / s**3
    return out


def test_constant_field():
    feats = jnp.full((1, 8, 8, 8, 3), 2.5)
    rois = jnp.asarray([[1.0, 1.0, 1.0, 6.0, 6.0, 6.0]])
    out = roi_align_3d(feats, rois, jnp.asarray([0]), (4, 4, 4))
    np.testing.assert_allclose(np.asarray(out), 2.5, rtol=1e-6)


def test_linear_field_exact():
    # f(x,y,z) = x: trilinear interp is exact on linear fields (interior)
    w = 16
    x = jnp.arange(w, dtype=jnp.float32)
    feats = jnp.broadcast_to(x[None, :, None, None, None], (1, w, w, w, 1))
    rois = jnp.asarray([[2.0, 2.0, 2.0, 10.0, 10.0, 10.0]])
    out = roi_align_3d(feats, rois, jnp.asarray([0]), (4, 4, 4))
    # bin centers along x: 2 + (i+0.5)*2 = 3,5,7,9
    want = np.array([3.0, 5.0, 7.0, 9.0])
    np.testing.assert_allclose(np.asarray(out)[0, :, 0, 0, 0], want, rtol=1e-5)


def test_matches_numpy_bruteforce():
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(10, 12, 9, 2)).astype(np.float32)
    rois = np.array(
        [
            [1.2, 0.7, 2.3, 8.9, 10.1, 7.7],
            [0.0, 0.0, 0.0, 10.0, 12.0, 9.0],
            [3.0, 3.0, 3.0, 5.5, 6.5, 6.0],
        ],
        np.float32,
    )
    got = np.asarray(
        roi_align_3d(
            jnp.asarray(feats)[None], jnp.asarray(rois), jnp.zeros(3, jnp.int32), (3, 3, 3)
        )
    )
    for i, roi in enumerate(rois):
        want = numpy_roi_align(feats, roi, (3, 3, 3))
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-5)


def test_spatial_scale():
    rng = np.random.default_rng(1)
    feats = rng.normal(size=(8, 8, 8, 1)).astype(np.float32)
    roi = np.array([4.0, 4.0, 4.0, 28.0, 28.0, 28.0], np.float32)  # input coords
    got = np.asarray(
        roi_align_3d(
            jnp.asarray(feats)[None],
            jnp.asarray(roi)[None],
            jnp.zeros(1, jnp.int32),
            (2, 2, 2),
            spatial_scale=0.25,
        )
    )
    want = numpy_roi_align(feats, roi, (2, 2, 2), scale=0.25)
    np.testing.assert_allclose(got[0], want, rtol=1e-4, atol=1e-5)


def test_roi_batch_selection():
    f0 = jnp.zeros((6, 6, 6, 1))
    f1 = jnp.ones((6, 6, 6, 1))
    feats = jnp.stack([f0, f1])
    rois = jnp.asarray([[1.0, 1, 1, 5, 5, 5], [1.0, 1, 1, 5, 5, 5]])
    out = roi_align_3d(feats, rois, jnp.asarray([0, 1]), (2, 2, 2))
    np.testing.assert_allclose(np.asarray(out)[0], 0.0)
    np.testing.assert_allclose(np.asarray(out)[1], 1.0)


def test_sampling_ratio_2():
    rng = np.random.default_rng(2)
    feats = rng.normal(size=(8, 8, 8, 1)).astype(np.float32)
    roi = np.array([1.0, 1.5, 0.5, 7.0, 6.5, 7.5], np.float32)
    got = np.asarray(
        roi_align_3d(
            jnp.asarray(feats)[None],
            jnp.asarray(roi)[None],
            jnp.zeros(1, jnp.int32),
            (2, 2, 2),
            sampling_ratio=2,
        )
    )
    want = numpy_roi_align(feats, roi, (2, 2, 2), s=2)
    np.testing.assert_allclose(got[0], want, rtol=1e-4, atol=1e-5)


def test_gradient_flows():
    feats = jnp.ones((1, 6, 6, 6, 2))
    rois = jnp.asarray([[1.0, 1, 1, 5, 5, 5]])

    def f(x):
        return jnp.sum(roi_align_3d(x, rois, jnp.asarray([0]), (3, 3, 3)) ** 2)

    g = jax.grad(f)(feats)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
    # gradient confined to voxels under the roi support
    assert np.asarray(g)[0, 0, 0, 0].sum() == 0  # corner outside roi


def test_jit_static_shapes():
    feats = jnp.ones((2, 8, 8, 8, 4))
    rois = jnp.ones((5, 6)) * jnp.asarray([1, 1, 1, 7, 7, 7.0])
    f = jax.jit(
        lambda x, r, b: roi_align_3d(x, r, b, (5, 5, 5))
    )
    out = f(feats, rois, jnp.zeros(5, jnp.int32))
    assert out.shape == (5, 5, 5, 5, 4)


def test_project_masks_on_boxes():
    masks = jnp.zeros((2, 8, 8, 8)).at[0, 2:6, 2:6, 2:6].set(1.0).at[1, :4].set(1.0)
    boxes = jnp.asarray([[2.0, 2, 2, 6, 6, 6], [0.0, 0, 0, 8, 8, 8]])
    out = np.asarray(project_masks_on_boxes(masks, boxes, (4, 4, 4)))
    assert out.shape == (2, 4, 4, 4)
    # box 0 is exactly the solid cube -> interior cells fully 1
    assert out[0, 1, 1, 1] == 1.0
    assert 0 <= out.min() and out.max() <= 1.0
