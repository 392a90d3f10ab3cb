"""FCOS-OBB 2D corner-projection aux loss (ref: fcos/loss.py:447-475,
579-585; exposed like run_fcos.py:111's --proj2d_loss_weight)."""
import numpy as np
import jax
import jax.numpy as jnp

from instance_nerf_tpu.models import fcos as F


def make_info(grid=32):
    shapes = [(grid // s,) * 3 for s in (4, 8, 16, 32)]
    return F.compute_locations(shapes, (4, 8, 16, 32))


def _obb_batch(rng, info):
    r = info.locations.shape[0]
    logits = jnp.asarray(rng.normal(size=(1, r)), jnp.float32)
    reg = jnp.asarray(rng.normal(size=(1, r, 8)) * 0.1, jnp.float32)
    reg = reg.at[..., :6].set(jnp.abs(reg[..., :6]))
    ctr = jnp.asarray(rng.normal(size=(1, r)), jnp.float32)
    gt = jnp.asarray([[[14.0, 14, 12, 12, 8, 10, 0.3]]], jnp.float32)
    mask = jnp.ones((1, 1), bool)
    return logits, reg, ctr, gt, mask


def test_proj2d_term_finite_and_additive():
    info = make_info(32)
    logits, reg, ctr, gt, mask = _obb_batch(np.random.default_rng(3), info)
    base = F.fcos_loss(info, logits, reg, ctr, gt, mask, use_obb=True)
    with2d = F.fcos_loss(
        info, logits, reg, ctr, gt, mask, use_obb=True, proj2d_loss_weight=1.0
    )
    assert np.isfinite(float(with2d["loss_reg"]))
    # random predictions project differently from the targets -> the term
    # strictly increases the reg loss
    assert float(with2d["loss_reg"]) > float(base["loss_reg"])


def test_proj2d_zero_for_perfect_predictions():
    info = make_info(32)
    gt = jnp.asarray([[[14.0, 14, 12, 12, 8, 10, 0.3]]], jnp.float32)
    mask = jnp.ones((1, 1), bool)
    labels, reg_t = F.fcos_targets_obb(info, gt[0], mask[0])
    logits = jnp.where(labels > 0, 20.0, -20.0)[None]
    ctr = jnp.full_like(logits, 10.0)
    base = F.fcos_loss(info, logits, reg_t[None], ctr, gt, mask, use_obb=True)
    with2d = F.fcos_loss(
        info, logits, reg_t[None], ctr, gt, mask, use_obb=True,
        proj2d_loss_weight=1.0,
    )
    np.testing.assert_allclose(
        float(with2d["loss_reg"]), float(base["loss_reg"]), atol=1e-5
    )


def test_proj2d_gives_yaw_a_gradient():
    """The term's raison d'etre: a yaw error must produce a gradient on
    the midpoint-offset channels (6:8) even where -log(IoU) is flat."""
    info = make_info(32)
    gt = jnp.asarray([[[14.0, 14, 12, 12, 8, 10, 0.3]]], jnp.float32)
    mask = jnp.ones((1, 1), bool)
    _, reg_t = F.fcos_targets_obb(info, gt[0], mask[0])
    logits = jnp.zeros((1, reg_t.shape[0]), jnp.float32)
    ctr = jnp.zeros_like(logits)
    # perturb only alpha/beta (the yaw channels)
    reg_bad = reg_t.at[:, 6:].add(0.2)[None]

    def loss_with(w, reg):
        return F.fcos_loss(
            info, logits, reg, ctr, gt, mask, use_obb=True,
            proj2d_loss_weight=w,
        )["loss_reg"]

    g = jax.grad(lambda r: loss_with(1.0, r))(reg_bad)
    assert np.isfinite(np.asarray(g)).all()
    gy = np.abs(np.asarray(g[..., 6:])).sum()
    assert gy > 0.0
    # and the term itself penalizes the yaw error
    assert float(loss_with(1.0, reg_bad)) > float(loss_with(0.0, reg_bad))


def test_proj2d_masked_positions_stay_nan_free():
    info = make_info(32)
    logits, reg, ctr, gt, mask = _obb_batch(np.random.default_rng(5), info)
    pm = jnp.zeros(logits.shape, bool)  # everything padded
    out = F.fcos_loss(
        info, logits, reg, ctr, gt, mask, pad_mask=pm, use_obb=True,
        proj2d_loss_weight=1.0,
    )
    g = jax.grad(
        lambda r: F.fcos_loss(
            info, logits, r, ctr, gt, mask, pad_mask=pm, use_obb=True,
            proj2d_loss_weight=1.0,
        )["loss_reg"]
    )(reg)
    assert np.isfinite(float(out["loss_reg"]))
    assert np.isfinite(np.asarray(g)).all()


def test_obb_encode_decode_theta_roundtrip():
    """Midpoint-offset encode -> decode recovers yaw exactly (under the
    box symmetry group) for arbitrary boxes — rules the representation
    out whenever theta errors appear in training (round-5 forensics:
    the 40deg plateau was the rotated-IoU self-overlap bug + missing
    proj2d term, NOT the coder)."""
    rng = np.random.default_rng(0)
    n = 200
    c = rng.uniform(20, 100, (n, 3))
    wlh = rng.uniform(6, 40, (n, 3))
    th = rng.uniform(-np.pi, np.pi, (n, 1))
    boxes = jnp.asarray(np.concatenate([c, wlh, th], -1), jnp.float32)
    locs = jnp.asarray(c + rng.uniform(-2, 2, (n, 3)), jnp.float32)
    dec = np.asarray(F.decode_fcos_obb(locs, F.encode_fcos_obb(locs, boxes)))
    b = np.asarray(boxes)
    # canonical theta error under (w,l,th) ~ (l,w,th+90) ~ (w,l,th+180)
    errs = []
    for i in range(n):
        best = 1e9
        for cw, cl, cth in ((b[i, 3], b[i, 4], b[i, 6]),
                            (b[i, 4], b[i, 3], b[i, 6] + np.pi / 2)):
            dt = (dec[i, 6] - cth + np.pi / 2) % np.pi - np.pi / 2
            best = min(best, abs(dt))
        errs.append(np.degrees(best))
    # mean is ~0.05 deg; isolated near-axis-aligned boxes can hit the
    # encode near_aabb threshold (0.1-voxel corner tie) and lose a few
    # degrees — a coder edge shared with the reference formula
    errs = np.asarray(errs)
    assert errs.mean() < 0.5, errs.mean()
    assert np.percentile(errs, 95) < 1.0, np.percentile(errs, 95)
    assert errs.max() < 15.0, errs.max()
    # geometric round-trip: decoded box overlaps the original near-perfectly
    from instance_nerf_tpu.ops.rotated_iou import cal_iou_3d

    ious = np.asarray(cal_iou_3d(jnp.asarray(dec)[None], boxes[None]))[0]
    assert np.median(ious) > 0.97, np.median(ious)
    assert (ious > 0.9).mean() > 0.95, (ious > 0.9).mean()
