"""Anchor-based 3D RPN (flax + fixed-shape JAX).

Capability parity with ``nerf_rcnn/model/{anchor,rpn,nerf_rpn}.py``
(SURVEY.md §2.3): anchor generation from sizes x unique aspect-ratio
permutations, shared conv-tower RPN head (objectness + 6/8-d deltas),
target assignment via IoU matcher with low-quality recovery, balanced
sampling, BCE + smooth-L1 (or rotated-IoU) + auxiliary 2D projection
losses, and per-level NMS proposal filtering.

TPU redesign: anchors are a trace-time constant ``(R, 6)`` array per
feature geometry (no per-forward regeneration); target assignment and
proposal filtering are batched fixed-shape ops; the per-level NMS uses
the class-offset trick with level ids.
"""
from __future__ import annotations

import itertools
from typing import Any, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from instance_nerf_tpu.ops import nms as nms_ops
from instance_nerf_tpu.ops.boxes import (
    box_iou_3d,
    clip_boxes_to_mesh,
    obb2hbb_3d,
    obb2points_3d,
    small_box_mask,
)
from instance_nerf_tpu.ops.coders import AABBCoder, MidpointOffsetCoder
from instance_nerf_tpu.ops.projection import projection_loss_points
from instance_nerf_tpu.ops.sampling import balanced_sample, match_proposals
from instance_nerf_tpu.models.fcos import optax_sigmoid_ce, smooth_l1

DEFAULT_ANCHOR_SIZES = ((8.0,), (16.0,), (32.0,), (64.0,))
DEFAULT_ASPECT_RATIOS = (
    ((1.0, 1.0, 1.0), (1.0, 1.0, 2.0), (1.0, 2.0, 2.0), (1.0, 1.0, 3.0), (1.0, 3.0, 3.0)),
) * 4


class AnchorGenerator3D:
    """Base anchors = sizes x unique ratio permutations; shifted over each
    FPN level's voxel grid (ref: anchor.py:14-174). Host/trace-time only —
    all outputs are static arrays."""

    def __init__(self, sizes=DEFAULT_ANCHOR_SIZES,
                 aspect_ratios=DEFAULT_ASPECT_RATIOS, is_normalized=False):
        self.sizes = sizes
        self.aspect_ratios = aspect_ratios
        self.is_normalized = is_normalized
        self.unique_ratios = []
        for level_ratios in aspect_ratios:
            perms = set()
            for r in level_ratios:
                perms.update(itertools.permutations(r))
            self.unique_ratios.append(sorted(perms))

    def num_anchors_per_location(self):
        return [len(s) * len(r) for s, r in zip(self.sizes, self.unique_ratios)]

    def base_anchors(self, level: int) -> np.ndarray:
        scales = np.asarray(self.sizes[level], np.float64)
        ratios = np.asarray(self.unique_ratios[level], np.float64)  # (P, 3)
        if self.is_normalized:
            ratios = ratios / np.cbrt(ratios.prod(axis=1, keepdims=True))
        whd = (ratios[:, None, :] * scales[None, :, None]).reshape(-1, 3)
        return np.round(np.concatenate([-whd, whd], axis=1) / 2).astype(np.float32)

    def grid_anchors(
        self, feature_shapes: Sequence[tuple[int, int, int]],
        strides: Sequence[tuple[int, int, int]],
    ):
        """Per level: ((R_l*A_l, 6) anchors, level sizes). Anchor layout is
        location-major, anchor-minor: index = loc * A + a — matching the
        (N, W*L*H*A, C) flattening of head outputs."""
        out = []
        for lvl, (shape, stride) in enumerate(zip(feature_shapes, strides)):
            base = self.base_anchors(lvl)  # (A, 6)
            ax = [np.arange(s, dtype=np.float32) * st for s, st in zip(shape, stride)]
            gx, gy, gz = np.meshgrid(*ax, indexing="ij")
            shifts = np.stack([gx, gy, gz, gx, gy, gz], axis=-1).reshape(-1, 1, 6)
            out.append((shifts + base[None]).reshape(-1, 6))
        return out


class RPNHead(nn.Module):
    """Shared 3x3 conv tower -> 1x1 objectness + 1x1 deltas
    (ref: anchor.py:177-213)."""

    num_anchors: int
    conv_depth: int = 4
    rotated: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        d = 8 if self.rotated else 6
        convs = [
            nn.Conv(
                features[0].shape[-1], (3, 3, 3), padding="SAME",
                dtype=self.dtype, kernel_init=nn.initializers.normal(0.01),
                name=f"conv_{i}",
            )
            for i in range(self.conv_depth)
        ]
        cls = nn.Conv(self.num_anchors, (1, 1, 1), dtype=self.dtype,
                      kernel_init=nn.initializers.normal(0.01), name="cls_logits")
        reg = nn.Conv(self.num_anchors * d, (1, 1, 1), dtype=self.dtype,
                      kernel_init=nn.initializers.normal(0.01), name="bbox_pred")
        logits, deltas = [], []
        for f in features:
            t = f
            for cv in convs:
                t = nn.relu(cv(t))
            logits.append(cls(t))  # (N, w, l, h, A)
            deltas.append(reg(t).reshape(*t.shape[:4], self.num_anchors, d))
        return logits, deltas


def flatten_head_outputs(logits, deltas):
    """(N, R_total) objectness + (N, R_total, D) deltas, location-major
    anchor-minor per level, levels concatenated."""
    n = logits[0].shape[0]
    obj = jnp.concatenate([l.reshape(n, -1) for l in logits], axis=1)
    d = deltas[0].shape[-1]
    reg = jnp.concatenate([r.reshape(n, -1, d) for r in deltas], axis=1)
    return obj, reg


def anchor_padding_mask(
    anchors_per_level: Sequence[jnp.ndarray],
    grid_sizes: jnp.ndarray,
    strides: Sequence[int],
) -> jnp.ndarray:
    """(N, R_total) True for anchors whose grid cell lies inside each
    scene's un-padded region (ref: anchor.py:124-152: cells <
    ceil(ori_size / stride))."""
    masks = []
    for a, s in zip(anchors_per_level, strides):
        # base anchors are symmetric about their cell shift, so the cell
        # coordinate is the box midpoint
        cell = 0.5 * (a[:, 0:3] + a[:, 3:6])
        limit = jnp.ceil(grid_sizes / s) * s  # (N, 3)
        masks.append(jnp.all(cell[None] < limit[:, None, :], axis=-1))
    return jnp.concatenate(masks, axis=1)


class RPNTargets(NamedTuple):
    labels: jnp.ndarray  # (R,) float {1, 0, -1}
    matched_gt: jnp.ndarray  # (R, 6|7)


def assign_targets_to_anchors(
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_mask: jnp.ndarray,
    fg_iou_thresh: float = 0.7,
    bg_iou_thresh: float = 0.3,
    pad_mask: jnp.ndarray | None = None,
) -> RPNTargets:
    """Single-scene assignment (ref: rpn.py:243-306). vmap over scenes."""
    gt_for_iou = obb2hbb_3d(gt_boxes) if gt_boxes.shape[-1] == 7 else gt_boxes
    quality = box_iou_3d(gt_for_iou, anchors)  # (K, R)
    quality = jnp.where(gt_mask[:, None], quality, -1.0)
    if pad_mask is not None:
        quality = jnp.where(pad_mask[None, :], quality, -1.0)
    matched = match_proposals(
        quality, fg_iou_thresh, bg_iou_thresh,
        allow_low_quality_matches=True, gt_valid=gt_mask,
    )
    matched_gt = gt_boxes[jnp.clip(matched, 0)]
    labels = jnp.where(matched >= 0, 1.0, jnp.where(matched == -1, 0.0, -1.0))
    if pad_mask is not None:
        labels = jnp.where(pad_mask, labels, -1.0)
    # no valid gt at all -> everything background (ref: rpn.py:248-252)
    any_gt = jnp.any(gt_mask)
    labels = jnp.where(any_gt, labels, jnp.where(
        pad_mask if pad_mask is not None else True, 0.0, -1.0))
    matched_gt = jnp.where(any_gt, matched_gt, jnp.zeros_like(matched_gt))
    return RPNTargets(labels, matched_gt)


def rpn_loss(
    key: jax.Array,
    objectness: jnp.ndarray,  # (N, R)
    pred_deltas: jnp.ndarray,  # (N, R, 6|8)
    anchors: jnp.ndarray,  # (R, 6)
    gt_boxes: jnp.ndarray,  # (N, K, 6|7)
    gt_mask: jnp.ndarray,  # (N, K)
    batch_size_per_mesh: int = 256,
    positive_fraction: float = 0.5,
    fg_iou_thresh: float = 0.7,
    bg_iou_thresh: float = 0.3,
    pad_mask: jnp.ndarray | None = None,
    rotated: bool = False,
    reg_loss_type: str = "smooth_l1",
    max_mesh_dim: int = 160,
    proj2d: bool = True,
):
    """BCE objectness + box regression + 2D projection aux loss
    (ref: rpn.py:372-456)."""
    n = objectness.shape[0]
    coder = MidpointOffsetCoder() if rotated else AABBCoder()

    def per_scene(gt, gm, pm):
        return assign_targets_to_anchors(
            anchors, gt, gm, fg_iou_thresh, bg_iou_thresh, pm
        )

    targets = jax.vmap(per_scene)(
        gt_boxes, gt_mask,
        pad_mask if pad_mask is not None else jnp.ones((n, anchors.shape[0]), bool),
    )

    anchors_b = jnp.broadcast_to(anchors, (n, *anchors.shape))
    reg_targets = coder.encode(targets.matched_gt, anchors_b)  # (N, R, D)

    keys = jax.random.split(key, n)
    samples = jax.vmap(
        lambda k, lab: balanced_sample(
            k, lab.astype(jnp.int32), batch_size_per_mesh, positive_fraction
        )
    )(keys, targets.labels)
    pos = samples.pos_mask
    sampled = jnp.logical_or(pos, samples.neg_mask)
    num_sampled = jnp.maximum(jnp.sum(sampled), 1)
    num_pos = jnp.maximum(jnp.sum(pos), 1)

    # objectness BCE over sampled anchors
    bce = optax_sigmoid_ce(objectness, targets.labels)
    loss_obj = jnp.sum(jnp.where(sampled, bce, 0.0)) / num_sampled

    # box regression on positives
    if reg_loss_type == "smooth_l1":
        per = jnp.sum(smooth_l1(pred_deltas, reg_targets, beta=1 / 9), axis=-1)
        loss_reg = jnp.sum(jnp.where(pos, per, 0.0)) / num_sampled
    else:
        from instance_nerf_tpu.models.fcos import rotated_iou_loss as _riou
        from instance_nerf_tpu.ops.rotated_iou import cal_giou_3d, cal_diou_3d, cal_iou_3d

        pred_boxes = coder.decode(pred_deltas, anchors_b)
        tgt = targets.matched_gt
        if reg_loss_type in ("iou", "linear_iou"):
            ious, _, _, _, unions = cal_iou_3d(pred_boxes, tgt, verbose=True)
            ious = (ious * unions + 1.0) / (unions + 1.0)
            per = -jnp.log(jnp.maximum(ious, 1e-10)) if reg_loss_type == "iou" else 1 - ious
        elif reg_loss_type == "giou":
            per, _, _ = cal_giou_3d(pred_boxes, tgt)
        else:
            per, _ = cal_diou_3d(pred_boxes, tgt)
        loss_reg = jnp.sum(jnp.where(pos, per, 0.0)) / num_sampled

    losses = {"loss_objectness": loss_obj, "loss_rpn_box_reg": loss_reg}

    if proj2d:
        # project box corner points through 4 fixed cameras (ref: rpn.py:420-456)
        pred_boxes = coder.decode(pred_deltas, anchors_b)
        w = pos.astype(pred_boxes.dtype)
        if rotated:
            pts_p = obb2points_3d(pred_boxes.reshape(-1, 7))
            pts_t = obb2points_3d(targets.matched_gt.reshape(-1, 7))
            wts = jnp.concatenate([w.reshape(-1)] * 2)
        else:
            pb = pred_boxes.reshape(-1, 6)
            tb = targets.matched_gt.reshape(-1, 6)
            pts_p = jnp.concatenate([pb[:, :3], pb[:, 3:]], axis=0)
            pts_t = jnp.concatenate([tb[:, :3], tb[:, 3:]], axis=0)
            wts = jnp.concatenate([w.reshape(-1)] * 2)
        losses["loss_rpn_box_reg_2d"] = projection_loss_points(
            pts_p, pts_t, wts, res=max_mesh_dim
        ) / num_pos
    return losses


class RPNProposals(NamedTuple):
    boxes: jnp.ndarray  # (N, P, 6|7)
    scores: jnp.ndarray  # (N, P)
    level_ids: jnp.ndarray  # (N, P)
    valid: jnp.ndarray  # (N, P)


def filter_proposals(
    objectness: jnp.ndarray,  # (N, R)
    pred_deltas: jnp.ndarray,  # (N, R, D)
    anchors_per_level: Sequence[jnp.ndarray],
    grid_sizes: jnp.ndarray,  # (N, 3)
    pre_nms_top_n: int = 1000,
    post_nms_top_n: int = 1000,
    nms_thresh: float = 0.7,
    score_thresh: float = 0.0,
    min_size: float = 1e-3,
    pad_mask: jnp.ndarray | None = None,
    rotated: bool = False,
) -> RPNProposals:
    """Decode + per-level top-n + clip + per-LEVEL NMS + global top-n
    (ref: rpn.py:303-370). Static shapes throughout."""
    coder = MidpointOffsetCoder() if rotated else AABBCoder()
    if pad_mask is not None:
        objectness = jnp.where(pad_mask, objectness, -jnp.inf)

    counts = [a.shape[0] for a in anchors_per_level]
    offsets = np.concatenate([[0], np.cumsum(counts)])

    def per_scene(obj_s, deltas_s, gsize):
        boxes_l, scores_l, lvl_l, valid_l = [], [], [], []
        for lvl, a in enumerate(anchors_per_level):
            s = obj_s[offsets[lvl] : offsets[lvl + 1]]
            d = deltas_s[offsets[lvl] : offsets[lvl + 1]]
            k = min(pre_nms_top_n, s.shape[0])
            top_s, top_i = jax.lax.top_k(s, k)
            valid = top_s > -jnp.inf
            boxes = coder.decode(d[top_i], a[top_i])
            scores = jax.nn.sigmoid(top_s)
            if not rotated:
                boxes = clip_boxes_to_mesh(boxes, gsize)
            valid &= small_box_mask(boxes, min_size)
            valid &= scores >= score_thresh
            boxes_l.append(boxes)
            scores_l.append(scores)
            lvl_l.append(jnp.full((k,), lvl, jnp.int32))
            valid_l.append(valid)

        boxes = jnp.concatenate(boxes_l)
        scores = jnp.concatenate(scores_l)
        lvls = jnp.concatenate(lvl_l)
        valid = jnp.concatenate(valid_l)
        keep = nms_ops.batched_nms_mask(boxes, scores, lvls, nms_thresh, valid=valid)
        top_idx, top_mask = nms_ops.top_k_by_score(
            scores, min(post_nms_top_n, scores.shape[0]), valid=keep
        )
        return boxes[top_idx], scores[top_idx] * top_mask, lvls[top_idx], top_mask

    boxes, scores, lvls, valid = jax.vmap(per_scene)(
        objectness, pred_deltas, grid_sizes
    )
    return RPNProposals(boxes, scores, lvls, valid)


class NeRFRegionProposalNetwork(nn.Module):
    """Backbone + anchor RPN head (ref: nerf_rpn.py:21-217). Forward
    returns raw head outputs; losses/proposals via rpn_loss /
    filter_proposals with trace-time anchors."""

    backbone: Any
    anchor_generator: Any = None
    conv_depth: int = 4
    rotated: bool = False
    fpn_strides: Sequence[int] = (4, 8, 16, 32)
    dtype: jnp.dtype | None = None

    def _gen(self):
        return self.anchor_generator or AnchorGenerator3D()

    @nn.compact
    def __call__(self, grids: jnp.ndarray):
        features = list(self.backbone(grids))[: len(self.fpn_strides)]
        gen = self._gen()
        head = RPNHead(
            num_anchors=gen.num_anchors_per_location()[0],
            conv_depth=self.conv_depth,
            rotated=self.rotated,
            dtype=self.dtype,
            name="rpn_head",
        )
        logits, deltas = head(features)
        obj, reg = flatten_head_outputs(logits, deltas)
        shapes = [tuple(f.shape[1:4]) for f in features]
        strides = [(s,) * 3 for s in self.fpn_strides]
        anchors = [jnp.asarray(a) for a in self._gen().grid_anchors(shapes, strides)]
        return obj, reg, anchors, features
