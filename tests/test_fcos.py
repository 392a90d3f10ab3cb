import numpy as np
import jax
import jax.numpy as jnp

from instance_nerf_tpu.models import fcos as F
from instance_nerf_tpu.models.backbones import VGG_FPN


def make_info(grid=32):
    shapes = [(grid // s,) * 3 for s in (4, 8, 16, 32)]
    return F.compute_locations(shapes, (4, 8, 16, 32))


def test_locations_layout():
    info = make_info(32)
    assert info.locations.shape == (8**3 + 4**3 + 2**3 + 1, 3)
    # first level: stride 4, centers at 2, 6, ...
    np.testing.assert_allclose(np.asarray(info.locations[0]), [2, 2, 2])
    np.testing.assert_allclose(np.asarray(info.locations[1]), [2, 2, 6])
    assert int(info.level_ids[0]) == 0 and int(info.level_ids[-1]) == 3
    assert float(info.strides[-1]) == 32.0


def test_padding_mask():
    info = make_info(32)
    sizes = jnp.asarray([[32, 32, 32], [16, 16, 16]], jnp.float32)
    pm = F.padding_mask(info, sizes)
    assert bool(pm[0].all())
    # scene 1: only locations with all coords < 16 are valid
    want = np.all(np.asarray(info.locations) < 16, axis=-1)
    np.testing.assert_array_equal(np.asarray(pm[1]), want)


def test_fcos_targets_assignment():
    info = make_info(32)
    gt = jnp.asarray([[4.0, 4, 4, 20, 20, 20], [0, 0, 0, 0, 0, 0]])
    mask = jnp.asarray([True, False])
    labels, reg = F.fcos_targets(info, gt, mask, center_sampling_radius=1.5)
    assert labels.shape == (info.locations.shape[0],)
    assert float(labels.sum()) > 0
    # a location at the gt center must be positive and its (normalized)
    # reg target must decode back to the gt box
    center = jnp.asarray([12.0, 12.0, 12.0])
    d = jnp.linalg.norm(info.locations - center, axis=-1) + jnp.where(
        info.level_ids == 0, 0.0, 1e6
    )
    i = int(jnp.argmin(d))
    assert float(labels[i]) == 1.0
    decoded = F.decode_fcos_aabb(info.locations[i], reg[i] * info.strides[i])
    np.testing.assert_allclose(np.asarray(decoded), [4, 4, 4, 20, 20, 20], atol=1e-4)


def test_fcos_targets_no_valid_gt():
    info = make_info(32)
    gt = jnp.zeros((3, 6))
    labels, reg = F.fcos_targets(info, gt, jnp.zeros(3, bool))
    assert float(labels.sum()) == 0


def test_centerness_at_center_is_one():
    reg = jnp.asarray([[5.0, 5, 5, 5, 5, 5], [1.0, 1, 1, 9, 9, 9]])
    c = np.asarray(F.centerness_target(reg))
    np.testing.assert_allclose(c[0], 1.0, atol=1e-6)
    assert c[1] < c[0]


def test_fcos_loss_runs_and_is_finite():
    info = make_info(32)
    r = info.locations.shape[0]
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(2, r)), jnp.float32)
    reg = jnp.abs(jnp.asarray(rng.normal(size=(2, r, 6)), jnp.float32))
    ctr = jnp.asarray(rng.normal(size=(2, r)), jnp.float32)
    gt = jnp.asarray(
        [[[4, 4, 4, 20, 20, 20]], [[8, 8, 8, 28, 28, 28]]], jnp.float32
    )
    mask = jnp.ones((2, 1), bool)
    losses = F.fcos_loss(info, logits, reg, ctr, gt, mask)
    for k in ("loss_cls", "loss_reg", "loss_centerness"):
        assert np.isfinite(float(losses[k])), k
    assert float(losses["num_pos"]) > 0


def test_fcos_loss_perfect_predictions_low_loss():
    info = make_info(32)
    gt = jnp.asarray([[[4.0, 4, 4, 20, 20, 20]]])
    mask = jnp.ones((1, 1), bool)
    labels, reg_t = F.fcos_targets(info, gt[0], mask[0])
    ctr_t = F.centerness_target(reg_t)
    logits = jnp.where(labels > 0, 20.0, -20.0)[None]
    ctr_logit = jnp.log(jnp.clip(ctr_t, 1e-6, 1 - 1e-6) / (1 - jnp.clip(ctr_t, 1e-6, 1 - 1e-6)))[None]
    losses = F.fcos_loss(info, logits, reg_t[None], ctr_logit, gt, mask)
    assert float(losses["loss_cls"]) < 1e-3
    assert float(losses["loss_reg"]) < 1e-2  # -log((I+1)/(U+1)) != 0 exactly
    assert float(losses["loss_centerness"]) < 1.0


def test_fcos_obb_encode_decode_roundtrip():
    locs = jnp.asarray([[10.0, 10.0, 10.0], [12.0, 9.0, 11.0]])
    boxes = jnp.asarray(
        [[10.0, 10, 10, 8, 4, 6, 0.4], [11.0, 10, 10, 6, 3, 4, -0.3]]
    )
    enc = F.encode_fcos_obb(locs, boxes)
    dec = np.asarray(F.decode_fcos_obb(locs, enc))
    np.testing.assert_allclose(dec[:, :3], np.asarray(boxes)[:, :3], atol=0.05)
    np.testing.assert_allclose(dec[:, 5], np.asarray(boxes)[:, 5], atol=1e-4)
    # w/l up to canonicalization
    got_wl = np.sort(dec[:, 3:5], axis=1)
    want_wl = np.sort(np.asarray(boxes)[:, 3:5], axis=1)
    np.testing.assert_allclose(got_wl, want_wl, rtol=0.05)


def test_fcos_postprocess_recovers_gt():
    info = make_info(32)
    r = info.locations.shape[0]
    gt_box = jnp.asarray([4.0, 4, 4, 20, 20, 20])
    labels, reg_t = F.fcos_targets(info, gt_box[None], jnp.ones(1, bool),
                                   norm_reg_targets=False)
    logits = jnp.where(labels > 0, 8.0, -8.0)[None]
    ctr = jnp.full((1, r), 8.0)
    props = F.fcos_postprocess(
        info,
        logits,
        reg_t[None],
        ctr,
        jnp.asarray([[32.0, 32, 32]]),
        num_levels=4,
        pre_nms_top_n=64,
        fpn_post_nms_top_n=16,
        nms_thresh=0.3,
    )
    assert bool(props.valid[0, 0])
    np.testing.assert_allclose(
        np.asarray(props.boxes[0, 0]), np.asarray(gt_box), atol=0.5
    )
    # NMS collapsed the duplicates: few survivors
    assert int(props.valid.sum()) < 10


def test_fcos_over_nerf_end_to_end():
    model = F.FCOSOverNeRF(backbone=VGG_FPN(cfg="AF", input_size=160))
    grids = jnp.ones((1, 32, 32, 32, 4))
    params = model.init(jax.random.key(0), grids)
    info, logits, reg, ctr, feats = model.apply(params, grids)
    r = 8**3 + 4**3 + 2**3 + 1
    assert logits.shape == (1, r)
    assert reg.shape == (1, r, 6)
    assert ctr.shape == (1, r)
    assert len(feats) == 4


def test_fcos_loss_obb_path():
    info = make_info(32)
    r = info.locations.shape[0]
    rng = np.random.default_rng(7)
    logits = jnp.asarray(rng.normal(size=(1, r)), jnp.float32)
    reg = jnp.asarray(rng.normal(size=(1, r, 8)) * 0.1, jnp.float32)
    reg = reg.at[..., :6].set(jnp.abs(reg[..., :6]))
    ctr = jnp.asarray(rng.normal(size=(1, r)), jnp.float32)
    gt = jnp.asarray([[[14.0, 14, 12, 12, 8, 10, 0.3]]], jnp.float32)
    mask = jnp.ones((1, 1), bool)
    losses = F.fcos_loss(
        info, logits, reg, ctr, gt, mask, use_obb=True,
        iou_loss_type="giou", use_additional_l1_loss=True,
    )
    for k in ("loss_cls", "loss_reg", "loss_centerness"):
        assert np.isfinite(float(losses[k])), (k, losses)
    assert float(losses["num_pos"]) > 0

    # gradients through the rotated path stay finite
    def lf(reg):
        l = F.fcos_loss(info, logits, reg, ctr, gt, mask, use_obb=True,
                        iou_loss_type="giou")
        return l["loss_reg"]

    g = jax.grad(lf)(reg)
    assert np.isfinite(np.asarray(g)).all()


def test_fcos_postprocess_obb():
    info = make_info(32)
    r = info.locations.shape[0]
    gt_obb = jnp.asarray([14.0, 14, 12, 12, 8, 10, 0.3])
    labels, reg_t = F.fcos_targets_obb(
        info, gt_obb[None], jnp.ones(1, bool), norm_reg_targets=False
    )
    logits = jnp.where(labels > 0, 8.0, -8.0)[None]
    ctr = jnp.full((1, r), 8.0)
    props = F.fcos_postprocess(
        info, logits, reg_t[None], ctr, jnp.asarray([[32.0, 32, 32]]),
        num_levels=4, pre_nms_top_n=64, fpn_post_nms_top_n=8,
        nms_thresh=0.3, use_obb=True,
    )
    assert bool(props.valid[0, 0])
    box = np.asarray(props.boxes[0, 0])
    assert box.shape == (7,)
    np.testing.assert_allclose(box[:3], [14, 14, 12], atol=0.6)
    np.testing.assert_allclose(box[5], 10.0, atol=0.5)


def test_obb_loss_gradient_finite_at_degenerate_preds():
    """Regression: all-zero 8-param predictions decode to zero-extent
    boxes whose norm-at-origin previously produced NaN GRADIENTS (finite
    forward) — the failure mode that NaN'd rotated training on TPU bf16."""
    rng = np.random.default_rng(0)
    n = 16
    pred = jnp.zeros((n, 8), jnp.float32)  # exact zeros: worst case
    tgt = jnp.asarray(
        np.concatenate([rng.uniform(1, 5, (n, 6)),
                        rng.uniform(-0.4, 0.4, (n, 2))], -1), jnp.float32)

    def loss(p):
        return jnp.sum(F.rotated_iou_loss(p, tgt, "iou"))

    val, g = jax.value_and_grad(loss)(pred)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(g)).all()
    # and with pred == target exactly (mid vectors can coincide)
    val2, g2 = jax.value_and_grad(loss)(tgt)
    assert np.isfinite(float(val2))
    assert np.isfinite(np.asarray(g2)).all()


def test_fcos_loss_f32_under_bf16_inputs():
    """fcos_loss must return finite f32 scalars for bf16 head outputs
    (the loss casts to f32 at entry)."""
    shapes = [(32 // st, 32 // st, 32 // st) for st in (4, 8, 16, 32)]
    info = F.compute_locations(shapes, (4, 8, 16, 32))
    r = info.locations.shape[0]
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(1, r)), jnp.bfloat16)
    reg = jnp.asarray(rng.uniform(0.1, 4, (1, r, 8)), jnp.bfloat16)
    ctr = jnp.asarray(rng.normal(size=(1, r)), jnp.bfloat16)
    gt = jnp.asarray([[[14, 14, 14, 10, 8, 9, 0.4]]], jnp.float32)
    gtm = jnp.ones((1, 1), bool)
    out = F.fcos_loss(info, logits, reg, ctr, gt, gtm, use_obb=True)
    for k in ("loss_cls", "loss_reg", "loss_centerness"):
        assert out[k].dtype == jnp.float32
        assert np.isfinite(float(out[k])), k
