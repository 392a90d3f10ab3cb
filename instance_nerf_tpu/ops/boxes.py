"""3D box geometry (pure JAX, fixed-shape, fully vectorized).

Conventions
-----------
* AABB: ``(N, 6)`` arrays ``(x1, y1, z1, x2, y2, z2)`` in grid coordinates.
* OBB:  ``(N, 7)`` arrays ``(x, y, z, w, l, h, theta)`` — z-axis yaw only.
* Set-valued ops never change array shapes; validity is tracked with
  boolean masks so everything stays jit-/vmap-friendly on TPU.

Behavioral parity targets (semantics, not code) in the reference:
``nerf_rcnn/model/utils.py:217-462`` (nms / batched_nms / box_iou_3d /
clip_boxes_to_mesh / remove_small_boxes / aabb_volume) and
``nerf_rcnn/model/coder/misc.py`` (obb2hbb_3d / obb2poly_3d / ...).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

PI = jnp.pi


def aabb_volume(boxes: jnp.ndarray) -> jnp.ndarray:
    """Volume of ``(..., 6)`` AABBs. Ref: utils.py:434-448."""
    whd = boxes[..., 3:6] - boxes[..., 0:3]
    return whd[..., 0] * whd[..., 1] * whd[..., 2]


def box_iou_3d(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise AABB IoU ``(N, M)``. Ref: utils.py:392-431,456-470.

    Zero-volume unions produce 0 (not NaN) so padded boxes are safe.
    """
    inter, union = _aabb_inter_union_3d(boxes1, boxes2)
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def _aabb_inter_union_3d(boxes1, boxes2):
    vol1 = aabb_volume(boxes1)
    vol2 = aabb_volume(boxes2)
    lt = jnp.maximum(boxes1[:, None, :3], boxes2[None, :, :3])
    rb = jnp.minimum(boxes1[:, None, 3:], boxes2[None, :, 3:])
    whd = jnp.clip(rb - lt, min=0)
    inter = whd[..., 0] * whd[..., 1] * whd[..., 2]
    union = vol1[:, None] + vol2[None, :] - inter
    return inter, union


def clip_boxes_to_mesh(boxes: jnp.ndarray, size) -> jnp.ndarray:
    """Clamp AABBs to ``[0, size]`` per axis. Ref: utils.py:334-360.

    ``size`` is ``(W, L, H)``. Works on ``(..., 6)``.
    """
    size = jnp.asarray(size, dtype=boxes.dtype)
    lo = jnp.clip(boxes[..., 0:3], min=0.0)
    lo = jnp.minimum(lo, size)
    hi = jnp.clip(boxes[..., 3:6], min=0.0)
    hi = jnp.minimum(hi, size)
    return jnp.concatenate([lo, hi], axis=-1)


def obb_center_inside_mesh(boxes: jnp.ndarray, size) -> jnp.ndarray:
    """OBB validity: center inside grid (the reference *drops* such boxes,
    utils.py:362-371; we return a mask instead)."""
    size = jnp.asarray(size, dtype=boxes.dtype)
    c = boxes[..., 0:3]
    return jnp.all((c >= 0) & (c <= size), axis=-1)


def small_box_mask(boxes: jnp.ndarray, min_size: float) -> jnp.ndarray:
    """True for boxes with *all* sides >= min_size. Ref: utils.py:270-291
    (returns indices there; mask here)."""
    if boxes.shape[-1] == 6:
        whd = boxes[..., 3:6] - boxes[..., 0:3]
    else:  # OBB (x,y,z,w,l,h,theta)
        whd = boxes[..., 3:6]
    return jnp.all(whd >= min_size, axis=-1)


def box_centers(boxes: jnp.ndarray) -> jnp.ndarray:
    if boxes.shape[-1] == 6:
        return 0.5 * (boxes[..., 0:3] + boxes[..., 3:6])
    return boxes[..., 0:3]


# ---------------------------------------------------------------------------
# OBB <-> other representations (ref: model/coder/misc.py)
# ---------------------------------------------------------------------------

def regular_theta(theta, mode="180", start=-PI / 2):
    """Wrap angles into ``[start, start+cycle)``. Ref: misc.py:5-12."""
    cycle = 2 * PI if mode == "360" else PI
    return (theta - start) % cycle + start


def regular_obb(obboxes: jnp.ndarray) -> jnp.ndarray:
    """Canonicalize 2D OBB ``(x,y,w,h,theta)`` so w >= h, theta in
    [-pi/2, pi/2). Ref: misc.py:14-20."""
    x, y, w, h, theta = jnp.moveaxis(obboxes, -1, 0)
    swap = w > h
    w_r = jnp.where(swap, w, h)
    h_r = jnp.where(swap, h, w)
    t_r = regular_theta(jnp.where(swap, theta, theta + PI / 2))
    return jnp.stack([x, y, w_r, h_r, t_r], axis=-1)


def rectpoly2obb(polys: jnp.ndarray) -> jnp.ndarray:
    """Rectangular 4-point polygon ``(..., 8)`` -> 2D OBB ``(..., 5)``.
    Ref: misc.py:23-43."""
    eps = 1e-7
    theta = jnp.arctan2(
        -(polys[..., 3] - polys[..., 1]), polys[..., 2] - polys[..., 0] + eps
    )
    c, s = jnp.cos(theta), jnp.sin(theta)
    rot = jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )  # (..., 2, 2)
    x = jnp.mean(polys[..., 0::2], axis=-1)
    y = jnp.mean(polys[..., 1::2], axis=-1)
    center = jnp.stack([x, y], axis=-1)[..., None, :]
    pts = polys.reshape(*polys.shape[:-1], 4, 2) - center
    # tiny contraction — keep f32 on the MXU (bf16 default loses ~1e-3)
    rot_pts = jnp.einsum("...ni,...ji->...nj", pts, rot,
                         precision=jax.lax.Precision.HIGHEST)
    w = jnp.max(rot_pts[..., 0], axis=-1) - jnp.min(rot_pts[..., 0], axis=-1)
    h = jnp.max(rot_pts[..., 1], axis=-1) - jnp.min(rot_pts[..., 1], axis=-1)
    return regular_obb(jnp.stack([x, y, w, h, theta], axis=-1))


def obb2hbb(obboxes: jnp.ndarray) -> jnp.ndarray:
    """2D OBB ``(..., 5)`` -> smallest enclosing 2D AABB ``(..., 4)``.
    Ref: misc.py:76-83."""
    center = obboxes[..., 0:2]
    w = obboxes[..., 2:3]
    h = obboxes[..., 3:4]
    theta = obboxes[..., 4:5]
    c, s = jnp.cos(theta), jnp.sin(theta)
    x_bias = jnp.abs(w / 2 * c) + jnp.abs(h / 2 * s)
    y_bias = jnp.abs(w / 2 * s) + jnp.abs(h / 2 * c)
    bias = jnp.concatenate([x_bias, y_bias], axis=-1)
    return jnp.concatenate([center - bias, center + bias], axis=-1)


def obb2poly(obboxes: jnp.ndarray) -> jnp.ndarray:
    """2D OBB ``(..., 5)`` -> 4 corner points ``(..., 8)``. Ref: misc.py:46-59."""
    center = obboxes[..., 0:2]
    w = obboxes[..., 2:3]
    h = obboxes[..., 3:4]
    theta = obboxes[..., 4:5]
    c, s = jnp.cos(theta), jnp.sin(theta)
    v1 = jnp.concatenate([w / 2 * c, -w / 2 * s], axis=-1)
    v2 = jnp.concatenate([-h / 2 * s, -h / 2 * c], axis=-1)
    p1 = center + v1 + v2
    p2 = center + v1 - v2
    p3 = center - v1 - v2
    p4 = center - v1 + v2
    return jnp.concatenate([p1, p2, p3, p4], axis=-1)


def obb2poly_3d(obboxes: jnp.ndarray) -> jnp.ndarray:
    """3D OBB ``(..., 7)`` -> 8 corner points ``(..., 24)``. Ref: misc.py:61-74."""
    obb2d = jnp.concatenate(
        [obboxes[..., 0:2], obboxes[..., 3:5], obboxes[..., 6:7]], axis=-1
    )
    poly2d = obb2poly(obb2d)
    half_h = obboxes[..., 5:6] / 2
    z0 = obboxes[..., 2:3] - half_h
    z1 = obboxes[..., 2:3] + half_h
    pts = poly2d.reshape(*poly2d.shape[:-1], 4, 2)
    lower = jnp.concatenate([pts, jnp.broadcast_to(z0[..., None, :], (*pts.shape[:-1], 1))], axis=-1)
    upper = jnp.concatenate([pts, jnp.broadcast_to(z1[..., None, :], (*pts.shape[:-1], 1))], axis=-1)
    return jnp.concatenate(
        [lower.reshape(*poly2d.shape[:-1], 12), upper.reshape(*poly2d.shape[:-1], 12)],
        axis=-1,
    )


def obb2hbb_3d(obboxes: jnp.ndarray) -> jnp.ndarray:
    """Smallest AABB containing the OBB. Ref: misc.py:85-92."""
    center = obboxes[..., 0:2]
    z = obboxes[..., 2:3]
    w = obboxes[..., 3:4]
    h = obboxes[..., 4:5]
    d = obboxes[..., 5:6]
    theta = obboxes[..., 6:7]
    c, s = jnp.cos(theta), jnp.sin(theta)
    x_bias = jnp.abs(w / 2 * c) + jnp.abs(h / 2 * s)
    y_bias = jnp.abs(w / 2 * s) + jnp.abs(h / 2 * c)
    bias = jnp.concatenate([x_bias, y_bias], axis=-1)
    z_bias = d / 2
    return jnp.concatenate(
        [center - bias, z - z_bias, center + bias, z + z_bias], axis=-1
    )


def aabb2obb_3d(boxes: jnp.ndarray) -> jnp.ndarray:
    """AABB ``(..., 6)`` -> OBB ``(..., 7)`` with theta = 0.
    Ref: rotated_iou/oriented_iou_loss.py (aabb2obb_3d)."""
    center = 0.5 * (boxes[..., 0:3] + boxes[..., 3:6])
    whd = boxes[..., 3:6] - boxes[..., 0:3]
    theta = jnp.zeros_like(boxes[..., 0:1])
    return jnp.concatenate([center, whd, theta], axis=-1)


def obb2points_3d(obboxes: jnp.ndarray) -> jnp.ndarray:
    """Two diagonal corner points per OBB, stacked along axis 0
    (preprocessing for the 2D projection aux loss). Ref: misc.py:94-100."""
    center = obboxes[..., 0:3]
    w = obboxes[..., 3:4]
    l = obboxes[..., 4:5]
    h = obboxes[..., 5:6]
    theta = obboxes[..., 6:7]
    c, s = jnp.cos(theta), jnp.sin(theta)
    vector = jnp.concatenate([w / 2 * c - l / 2 * s, w / 2 * s + l / 2 * c, h / 2], axis=-1)
    return jnp.concatenate([center - vector, center + vector], axis=0)
