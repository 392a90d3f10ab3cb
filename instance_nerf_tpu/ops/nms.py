"""Fixed-shape greedy 3D NMS for TPU.

The reference uses a Python ``while`` loop popping indices
(``nerf_rcnn/model/utils.py:217-232``) — data-dependent control flow that
cannot be jitted. Here: sort once by score, then a ``lax.fori_loop`` over a
precomputed IoU matrix carrying a suppression mask. Produces *identical*
greedy keep decisions (score-ordered sequential suppression, suppress when
IoU > threshold, strict) with static shapes.

Cost is O(K^2) in memory/compute — fine at the K <= 2500 this pipeline uses
(SURVEY.md §7.3).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from instance_nerf_tpu.ops.boxes import box_iou_3d
from instance_nerf_tpu.ops.rotated_iou import cal_iou_3d

NEG_INF = -1e30


def _sweep_xla(iou: jnp.ndarray, svalid: jnp.ndarray, iou_threshold) -> jnp.ndarray:
    """Greedy suppression sweep over a score-ordered IoU matrix (XLA
    fori_loop form). Returns keep mask in score order."""
    n = iou.shape[0]
    row_idx = jnp.arange(n)

    def body(i, suppressed):
        alive = jnp.logical_and(jnp.logical_not(suppressed[i]), svalid[i])
        kill = jnp.logical_and(alive, (iou[i] > iou_threshold) & (row_idx > i))
        return jnp.logical_or(suppressed, kill)

    suppressed = jax.lax.fori_loop(0, n, body, jnp.zeros((n,), dtype=bool))
    return jnp.logical_and(jnp.logical_not(suppressed), svalid)


def nms_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    valid: jnp.ndarray | None = None,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Greedy NMS; returns a boolean keep mask of shape ``(N,)``.

    Args:
      boxes: ``(N, 6)`` AABB or ``(N, 7)`` OBB.
      scores: ``(N,)``.
      valid: optional ``(N,)`` bool; invalid entries are never kept and
        never suppress anything.
      use_pallas: run the sequential sweep as a Pallas kernel (3.3x the
        XLA fori_loop at K=10k on v5e). Default: auto — on for TPU,
        off elsewhere. Keep decisions are identical either way.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    eff_scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-eff_scores)  # descending
    sboxes = boxes[order]

    if boxes.shape[-1] == 6:
        iou = box_iou_3d(sboxes, sboxes)
    else:
        iou = cal_iou_3d(sboxes[:, None, :], sboxes[None, :, :])

    svalid = valid[order]
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from instance_nerf_tpu.kernels.nms_pallas import nms_sweep_pallas

        keep_sorted = nms_sweep_pallas(iou, svalid, iou_threshold)
    else:
        keep_sorted = _sweep_xla(iou, svalid, iou_threshold)
    # scatter back to original index space
    keep = jnp.zeros((n,), dtype=bool).at[order].set(keep_sorted)
    return keep


def batched_nms_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    idxs: jnp.ndarray,
    iou_threshold: float,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Per-category NMS via the coordinate-offset trick — identical result to
    running NMS independently per class (ref: utils.py:235-267) with one
    fixed-shape pass.
    """
    if boxes.shape[0] == 0:
        return jnp.zeros((0,), dtype=bool)
    if boxes.shape[-1] == 6:
        span = jnp.max(jnp.abs(boxes)) + 1.0
        offsets = idxs.astype(boxes.dtype) * (2.0 * span)
        shifted = boxes + offsets[:, None]
    else:
        span = jnp.max(jnp.abs(boxes[:, :3])) + jnp.max(boxes[:, 3:6]) + 1.0
        offsets = idxs.astype(boxes.dtype) * (2.0 * span)
        shifted = boxes.at[:, 0].add(offsets)
    return nms_mask(shifted, scores, iou_threshold, valid=valid)


def top_k_by_score(
    scores: jnp.ndarray, k: int, valid: jnp.ndarray | None = None
):
    """Indices + mask of the top-k valid scores (descending), fixed shape."""
    if valid is not None:
        scores = jnp.where(valid, scores, NEG_INF)
    k = min(k, scores.shape[0])
    vals, idx = jax.lax.top_k(scores, k)
    mask = vals > NEG_INF / 2
    return idx, mask
