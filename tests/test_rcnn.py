import numpy as np
import jax
import jax.numpy as jnp

from instance_nerf_tpu.models import rcnn as RC
from instance_nerf_tpu.models.backbones import VGG_FPN
from instance_nerf_tpu.ops.poolers import map_levels, multiscale_roi_align_3d


def test_map_levels():
    boxes = jnp.asarray(
        [
            [0, 0, 0, 160, 160, 160],  # canonical scale -> level 4
            [0, 0, 0, 10, 10, 10],  # tiny -> lowest
        ],
        jnp.float32,
    )
    lvl = np.asarray(map_levels(boxes, k_min=2, k_max=5))
    assert lvl[0] == 2  # 4 - k_min
    assert lvl[1] == 0


def test_multiscale_roi_align_selects_level():
    # two pyramid levels with constant values 1 and 2; a small box should
    # pool from level with matching assignment
    f0 = jnp.ones((1, 16, 16, 16, 3))
    f1 = jnp.full((1, 8, 8, 8, 3), 2.0)
    # cbrt volumes 6 and 32 -> FPN eq.1 levels 1 and 2 (k_min=1)
    boxes = jnp.asarray([[[2, 2, 2, 8, 8, 8], [0, 0, 0, 32, 32, 32.0]]])
    out = multiscale_roi_align_3d(
        [f0, f1], boxes, (2, 2, 2), (32, 32, 32),
        canonical_scale=16, canonical_level=1,
    )
    assert out.shape == (1, 2, 2, 2, 2, 3)
    vals = np.asarray(out)
    assert np.allclose(vals[0, 0], 1.0) or np.allclose(vals[0, 0], 2.0)
    # the two boxes of very different size map to different levels
    assert not np.allclose(vals[0, 0], vals[0, 1])


def test_select_training_samples():
    rng = np.random.default_rng(0)
    gt = jnp.asarray([[[10, 10, 10, 30, 30, 30], [40, 40, 5, 60, 60, 25.0]]])
    gt_labels = jnp.asarray([[3, 7]])
    gt_mask = jnp.ones((1, 2), bool)
    props = jnp.asarray(
        rng.uniform(0, 30, (1, 20, 3)).astype(np.float32).repeat(2, axis=-1).reshape(1, 20, 6)
    )
    props = props.at[..., 3:].add(10.0)
    s = RC.select_training_samples(
        jax.random.key(0), props, jnp.ones((1, 20), bool),
        gt, gt_labels, gt_mask, batch_size_per_image=16,
    )
    assert s.rois.shape == (1, 16, 6)
    assert bool(s.valid.any())
    # appended gt proposals match themselves -> some positives exist
    assert int(s.pos.sum()) >= 2
    lab = np.asarray(s.labels[s.pos])
    assert set(lab.tolist()) <= {3, 7}
    assert np.isfinite(np.asarray(s.reg_targets)).all()


def test_fastrcnn_loss_perfect():
    n, s, c, d = 1, 8, 4, 6
    labels = jnp.asarray([[1, 2, 0, 0, 3, -1, -1, -1]])
    valid = labels >= 0
    logits = jax.nn.one_hot(jnp.clip(labels, 0), c) * 20.0
    reg_t = jnp.zeros((n, s, d))
    box_reg = jnp.zeros((n, s, c, d))
    cls_loss, box_loss = RC.fastrcnn_loss(logits, box_reg, labels, reg_t, valid)
    assert float(cls_loss) < 1e-3
    assert float(box_loss) == 0.0


def test_fastrcnn_loss_selects_own_class_deltas():
    labels = jnp.asarray([[2]])
    valid = jnp.ones((1, 1), bool)
    logits = jnp.zeros((1, 1, 4))
    box_reg = jnp.zeros((1, 1, 4, 6)).at[0, 0, 2].set(1.0)  # own class off
    reg_t = jnp.zeros((1, 1, 6))
    _, box_loss = RC.fastrcnn_loss(logits, box_reg, labels, reg_t, valid)
    assert float(box_loss) > 0
    box_reg2 = jnp.zeros((1, 1, 4, 6)).at[0, 0, 1].set(1.0)  # other class off
    _, box_loss2 = RC.fastrcnn_loss(logits, box_reg2, labels, reg_t, valid)
    assert float(box_loss2) == 0.0


def test_maskrcnn_loss_and_targets():
    gt_masks = jnp.zeros((2, 16, 16, 16)).at[0, 4:12, 4:12, 4:12].set(1.0)
    boxes = jnp.asarray([[4, 4, 4, 12, 12, 12.0]])
    labels = jnp.asarray([1])
    matched = jnp.asarray([0])
    valid = jnp.ones(1, bool)
    # logits matching the *projected* targets (trilinear boundary bins are
    # soft 0.5s) -> minimal achievable BCE; inverted logits -> large
    tgt = RC.project_gt_masks(gt_masks, boxes, matched, 8)
    tgt_c = jnp.clip(tgt, 1e-4, 1 - 1e-4)
    good_own = jnp.log(tgt_c / (1 - tgt_c))
    good = jnp.full((1, 8, 8, 8, 3), -20.0).at[..., 1].set(good_own)
    loss_good = RC.maskrcnn_loss(good, boxes, gt_masks, labels, matched, valid)
    bad = jnp.full((1, 8, 8, 8, 3), -20.0).at[..., 1].set(-good_own)
    loss_bad = RC.maskrcnn_loss(bad, boxes, gt_masks, labels, matched, valid)
    # min-entropy floor from the soft boundary bins stays; inverted is far worse
    assert float(loss_good) < 0.25
    assert float(loss_bad) > 4 * float(loss_good)


def test_postprocess_detections_recovers():
    from instance_nerf_tpu.ops.coders import AABBCoder

    coder = AABBCoder()
    props = jnp.asarray([[[8, 8, 8, 24, 24, 24], [40, 40, 40, 56, 56, 56.0]]])
    gt = jnp.asarray([[10, 10, 10, 22, 22, 22], [38, 42, 38, 58, 54, 58.0]])
    c = 3
    deltas = jnp.zeros((1, 2, c, 6))
    deltas = deltas.at[0, 0, 1].set(coder.encode(gt[0], props[0, 0]))
    deltas = deltas.at[0, 1, 2].set(coder.encode(gt[1], props[0, 1]))
    logits = jnp.asarray([[[0.0, 10.0, 0.0], [0.0, 0.0, 10.0]]])
    det = RC.postprocess_detections(
        logits, deltas, props, jnp.ones((1, 2), bool),
        jnp.asarray([[64.0, 64, 64]]), detections_per_img=4,
    )
    v = np.asarray(det.valid[0])
    assert v[:2].all()
    # with score_thresh=0 the low-score cross-class candidates survive
    # per-class NMS too (reference behavior); the top-2 by score are the
    # intended detections
    got = np.asarray(det.boxes[0][:2])
    lab = np.asarray(det.labels[0][:2])
    order = np.argsort(lab)
    np.testing.assert_allclose(got[order], np.asarray(gt), atol=1e-3)
    assert sorted(lab.tolist()) == [1, 2]


def test_maskrcnn_inference_selects_label_channel():
    logits = jnp.zeros((2, 4, 4, 4, 3)).at[..., 1].set(5.0).at[..., 2].set(-5.0)
    out = RC.maskrcnn_inference(logits, jnp.asarray([1, 2]))
    assert float(out[0].mean()) > 0.9
    assert float(out[1].mean()) < 0.1


def test_paste_masks():
    from instance_nerf_tpu.ops.mask_paste import paste_masks_in_image

    probs = jnp.ones((1, 4, 4, 4))
    boxes = jnp.asarray([[4, 4, 4, 12, 12, 12.0]])
    out = np.asarray(paste_masks_in_image(probs, boxes, (16, 16, 16)))
    assert out.shape == (1, 16, 16, 16)
    assert out[0, 8, 8, 8]  # inside
    assert not out[0, 1, 1, 1]  # outside
    # pasted volume close to box volume
    np.testing.assert_allclose(out[0].sum(), 8**3, rtol=0.3)


def test_nerf_rcnn_end_to_end_smoke():
    model = RC.NeRF_RCNN(
        backbone=VGG_FPN(cfg="AF", input_size=160),
        num_classes=4,
        input_shape=(32, 32, 32),
    )
    grids = jnp.ones((1, 32, 32, 32, 4))
    rois = jnp.asarray([[[4, 4, 4, 20, 20, 20], [8, 8, 8, 28, 28, 28.0]]])
    params = model.init(jax.random.key(0), grids, rois, with_masks=True)
    feats, cls, deltas = model.apply(params, grids, rois)
    assert cls.shape == (1, 2, 4)
    assert deltas.shape == (1, 2, 4, 6)
    masks = model.apply(params, feats, rois, method=RC.NeRF_RCNN.mask_forward)
    assert masks.shape == (1, 2, 20, 20, 20, 4)
