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


def _pairwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    if a.shape[-1] == 6:
        return box_iou_3d(a, b)
    return cal_iou_3d(a[:, None, :], b[None, :, :])


def _sweep_xla_streamed(
    sboxes: jnp.ndarray,  # (N, 6|7) score-ordered
    svalid: jnp.ndarray,  # (N,) bool
    iou_threshold,
    block: int = 512,
) -> jnp.ndarray:
    """Greedy sweep streaming the IoU matrix in ``block``-row tiles:
    O(block * N) live memory instead of O(N^2) (433 MB f32 at the 10.4k
    FCOS budget — times batch under vmap). Identical keep decisions.

    Per tile: an in-tile sequential sweep (seeded with suppression
    carried in from earlier tiles), then one vectorized cross-tile pass
    where this tile's kept boxes suppress all later boxes.
    """
    n, d = sboxes.shape
    block = min(block, n)
    n_pad = -(-n // block) * block
    boxes_p = jnp.pad(sboxes, ((0, n_pad - n), (0, 0)))
    valid_p = jnp.pad(svalid, (0, n_pad - n))
    tiles = boxes_p.reshape(-1, block, d)
    gidx = jnp.arange(n_pad)

    def tile_body(suppressed, xs):
        t, tile = xs
        start = t * block
        sup_t = jax.lax.dynamic_slice(suppressed, (start,), (block,))
        val_t = jax.lax.dynamic_slice(valid_p, (start,), (block,))
        iou_tt = _pairwise_iou(tile, tile)  # (B, B)
        row = jnp.arange(block)

        def body(i, sup):
            alive = jnp.logical_and(jnp.logical_not(sup[i]), val_t[i])
            kill = jnp.logical_and(
                alive, (iou_tt[i] > iou_threshold) & (row > i)
            )
            return jnp.logical_or(sup, kill)

        sup_t = jax.lax.fori_loop(0, block, body, sup_t)
        kept_t = jnp.logical_and(jnp.logical_not(sup_t), val_t)  # (B,)
        # kept boxes in this tile suppress everything AFTER the tile
        iou_cross = _pairwise_iou(tile, boxes_p)  # (B, N)
        kill = jnp.any(
            kept_t[:, None] & (iou_cross > iou_threshold), axis=0
        ) & (gidx >= start + block)
        suppressed = jnp.logical_or(suppressed, kill)
        suppressed = jax.lax.dynamic_update_slice(suppressed, sup_t, (start,))
        return suppressed, None

    n_tiles = n_pad // block
    suppressed, _ = jax.lax.scan(
        tile_body, jnp.zeros((n_pad,), bool), (jnp.arange(n_tiles), tiles)
    )
    return jnp.logical_and(jnp.logical_not(suppressed), valid_p)[:n]


# above this candidate count the dense (N, N) IoU matrix is streamed /
# fused instead of materialized (10.4k^2 f32 = 433 MB per scene)
DENSE_NMS_MAX = 4096


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
      use_pallas: run the sequential sweep as a Pallas kernel; for AABBs
        the IoU row is computed in-kernel so the (N, N) matrix never
        exists. Default: auto — on for TPU, off elsewhere. Keep
        decisions are identical across all paths.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    eff_scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-eff_scores)  # descending
    sboxes = boxes[order]
    svalid = valid[order]
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    if use_pallas and boxes.shape[-1] == 6:
        from instance_nerf_tpu.kernels.nms_pallas import nms_boxes_pallas

        keep_sorted = nms_boxes_pallas(sboxes, svalid, iou_threshold)
    elif n > DENSE_NMS_MAX:
        keep_sorted = _sweep_xla_streamed(sboxes, svalid, iou_threshold)
    else:
        iou = _pairwise_iou(sboxes, sboxes)
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
