"""Golden tests for the legacy ROIPool against numpy ports of the
reference math (nerf_rcnn/model/detector.py:170-438)."""
import numpy as np
import jax.numpy as jnp

from instance_nerf_tpu.ops import legacy_roi_pool as L


def ref_eight_corner(feat, pts):
    """Numpy port of detector.py:348-365 (weights 1-|dx||dy||dz|, /8,
    in-bounds mask). feat (W,L,H,C) channels-last; pts (N,3)."""
    w, l, h, c = feat.shape
    size = np.asarray([w, l, h]) - 1
    acc = np.zeros((pts.shape[0], c))
    fns = [np.floor, np.ceil]
    for a in range(2):
        for b in range(2):
            for d in range(2):
                corner = np.stack(
                    [fns[a](pts[:, 0]), fns[b](pts[:, 1]), fns[d](pts[:, 2])],
                    axis=-1)
                cc = np.clip(corner, 0, size).astype(int)
                vals = feat[cc[:, 0], cc[:, 1], cc[:, 2]]
                scale = (np.abs(pts[:, 0] - corner[:, 0])
                         * np.abs(pts[:, 1] - corner[:, 1])
                         * np.abs(pts[:, 2] - corner[:, 2]))
                acc += vals * (1.0 - scale)[:, None]
    acc /= 8.0
    mask = ((pts >= 0) & (pts <= size)).all(axis=-1)
    return acc * mask[:, None]


def ref_rotated_pool_one(feat, roi, scale, output_size, enlarge=0.2,
                         mode="pooling"):
    """Numpy port of rotated_forward for ONE roi on ONE level
    (detector.py:295-390). roi = (cx,cy,cz,w,h,d,theta)."""
    roi = roi.copy()
    roi[3:6] *= 1 + enlarge
    gs = np.maximum(np.ceil(roi[3:6] / scale).astype(int), 1)
    gx, gy, gz = np.meshgrid(*[np.arange(s) for s in gs], indexing="ij")
    pos = np.stack([gx, gy, gz], 0).reshape(3, -1).astype(float)
    th = roi[6]
    rot = np.array([[np.cos(th), -np.sin(th), 0],
                    [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    pos = pos - (gs[:, None] - 1) / 2.0
    pos = rot @ pos
    pos = pos + roi[:3, None] / scale
    vals = ref_eight_corner(feat, pos.T)  # (N, C)
    c = feat.shape[-1]
    grid = vals.reshape(*gs, c)
    if mode == "pooling":
        out = np.zeros((*output_size, c))
        k = np.ceil(gs / np.asarray(output_size)).astype(int)
        # zero-pad to k*out then max-pool (detector.py:380-386)
        pad = k * np.asarray(output_size) - gs
        grid_p = np.pad(grid, [(0, pad[0]), (0, pad[1]), (0, pad[2]), (0, 0)])
        for i in range(output_size[0]):
            for j in range(output_size[1]):
                for m in range(output_size[2]):
                    blk = grid_p[i*k[0]:(i+1)*k[0], j*k[1]:(j+1)*k[1],
                                 m*k[2]:(m+1)*k[2]]
                    out[i, j, m] = blk.reshape(-1, c).max(axis=0)
        return out
    raise NotImplementedError


def test_eight_corner_matches_reference_oracle():
    rng = np.random.default_rng(0)
    feat = rng.normal(size=(6, 7, 8, 3)).astype(np.float32)
    pts = rng.uniform(-1.5, 8.5, (200, 3)).astype(np.float32)
    got = np.asarray(L.eight_corner_sample(jnp.asarray(feat), jnp.asarray(pts)))
    want = ref_eight_corner(feat.astype(np.float64), pts.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_eight_corner_identity_at_integer_points():
    rng = np.random.default_rng(1)
    feat = rng.normal(size=(5, 5, 5, 2)).astype(np.float32)
    pts = np.stack(np.meshgrid(*[np.arange(5.0)] * 3, indexing="ij"),
                   -1).reshape(-1, 3)
    got = np.asarray(L.eight_corner_sample(jnp.asarray(feat),
                                           jnp.asarray(pts, jnp.float32)))
    np.testing.assert_allclose(got, feat.reshape(-1, 2), rtol=1e-5)


def test_rotated_pool_matches_reference_oracle():
    rng = np.random.default_rng(2)
    feat = rng.normal(size=(16, 16, 12, 4)).astype(np.float32)
    rois = np.stack([
        [8.0, 8.0, 6.0, 8.0, 5.0, 6.0, 0.4],
        [6.0, 9.0, 5.0, 4.0, 7.0, 4.0, -1.1],
        [10.0, 6.0, 6.0, 6.0, 6.0, 8.0, 0.0],
    ]).astype(np.float32)
    scale = 2
    out_size = (2, 2, 2)
    got = np.asarray(L.legacy_roi_pool(
        (jnp.asarray(feat),), jnp.asarray(rois),
        jnp.zeros((3,), jnp.int32), (scale,),
        output_size=out_size, extracting_type="pooling",
        rotated=True, max_grid=16,
    ))
    for i in range(3):
        want = ref_rotated_pool_one(
            feat.astype(np.float64), rois[i].astype(np.float64),
            scale, out_size)
        np.testing.assert_allclose(got[i], want, rtol=1e-3, atol=1e-4), i


def test_aabb_integer_crop_matches_maxpool():
    """rotated=False == the reference's integer crop + adaptive maxpool
    (detector.py:407-438) for interior rois."""
    rng = np.random.default_rng(3)
    feat = rng.uniform(0.1, 1.0, (20, 20, 16, 3)).astype(np.float32)
    roi = np.asarray([[4.0, 4.0, 4.0, 12.0, 14.0, 10.0]], np.float32)
    scale = 2
    out_size = (2, 2, 2)
    got = np.asarray(L.legacy_roi_pool(
        (jnp.asarray(feat),), jnp.asarray(roi), jnp.zeros((1,), jnp.int32),
        (scale,), output_size=out_size, extracting_type="pooling",
        rotated=False, max_grid=16,
    ))[0]
    # oracle: enlarge about center, integer crop, zero-pad, max-pool
    lo = roi[0, :3]; hi = roi[0, 3:]
    ext = (hi - lo) / 2 * 1.2
    c = (hi + lo) / 2
    lo_i = np.floor((c - ext) / scale).astype(int)
    hi_i = np.floor((c + ext) / scale).astype(int)
    crop = feat[lo_i[0]:hi_i[0] + 1, lo_i[1]:hi_i[1] + 1, lo_i[2]:hi_i[2] + 1]
    gs = np.asarray(crop.shape[:3])
    k = np.ceil(gs / np.asarray(out_size)).astype(int)
    pad = k * np.asarray(out_size) - gs
    crop_p = np.pad(crop, [(0, pad[0]), (0, pad[1]), (0, pad[2]), (0, 0)])
    want = np.zeros((*out_size, 3))
    for i in range(2):
        for j in range(2):
            for m in range(2):
                want[i, j, m] = crop_p[i*k[0]:(i+1)*k[0], j*k[1]:(j+1)*k[1],
                                       m*k[2]:(m+1)*k[2]].reshape(-1, 3).max(0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_interpolation_mode_runs_and_center():
    rng = np.random.default_rng(4)
    feat = rng.normal(size=(12, 12, 12, 2)).astype(np.float32)
    rois = np.asarray([[6.0, 6.0, 6.0, 4.0, 4.0, 4.0, 0.0]], np.float32)
    got = np.asarray(L.legacy_roi_pool(
        (jnp.asarray(feat),), jnp.asarray(rois), jnp.zeros((1,), jnp.int32),
        (1,), output_size=(3, 3, 3), extracting_type="interpolation",
        rotated=True, max_grid=8,
    ))
    assert got.shape == (1, 3, 3, 3, 2)
    assert np.isfinite(got).all()
