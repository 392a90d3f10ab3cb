"""Virtual-camera 2D projection helpers for the auxiliary RPN loss.

Semantics: ``nerf_rcnn/model/rpn.py:30-102`` (four fixed corner cameras
looking at the grid centroid; project box corner points through K·[R|t]
and penalize 2D smooth-L1). Shared by the anchor RPN and FCOS OBB paths
(duplicated in the reference at fcos/utils.py:300-379).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

DEFAULT_K = np.array(
    [[600.0, 0.0, 320.0], [0.0, 600.0, 240.0], [0.0, 0.0, 1.0]], np.float32
)


def _normalize(x):
    n = np.linalg.norm(x)
    return x / (n if n != 0 else 1.0)


def look_at_rotation(camera_position, at=None, up=(0, 0, -1)):
    """World->view rotation for a camera at ``camera_position`` looking at
    ``at`` (ref: rpn.py:37-67)."""
    camera_position = np.asarray(camera_position, np.float64)
    at = np.zeros(3) if at is None else np.asarray(at, np.float64)
    up = np.asarray(up, np.float64)
    z_axis = _normalize(camera_position - at)
    x_axis = _normalize(np.cross(up, z_axis))
    y_axis = _normalize(np.cross(z_axis, x_axis))
    return np.stack([x_axis, y_axis, z_axis], axis=1)


def c2w_from_loc_and_at(cam_pos, at, up=(0, 0, 1)):
    c2w = np.eye(4)
    c2w[:3, 3] = cam_pos
    c2w[:3, :3] = look_at_rotation(np.asarray(cam_pos, np.float64), at=at, up=up)
    return c2w


def get_w2cs(res: int = 160) -> np.ndarray:
    """(4, 4, 4) world->camera matrices from the 4 fixed corner cameras
    (ref: rpn.py:79-85)."""
    centroid = np.array([res / 2.0] * 3)
    positions = (
        np.array([[res, res, res], [res, -res, res], [-res, res, res], [-res, -res, res]])
        + centroid
    )
    return np.stack(
        [np.linalg.inv(c2w_from_loc_and_at(p, centroid)) for p in positions]
    ).astype(np.float32)


def project(intrinsic, pose, points_h, eps: float = 1e-6):
    """Project homogeneous world points (N, 4) -> pixel coords (N, 2).

    z is clamped away from 0 so points at the camera plane can't emit
    inf/NaN into masked-loss gradients.
    """
    cam = points_h @ pose.T  # (N, 4)
    pic = cam[..., :3] @ intrinsic.T
    z = pic[..., 2:3]
    z = jnp.where(jnp.abs(z) < eps, jnp.where(z < 0, -eps, eps), z)
    return pic[..., :2] / z


def projection_loss_points(pred_pts, target_pts, weights, res: int,
                           intrinsic=None, beta: float = 1 / 9):
    """Smooth-L1 between projected 2D coords of prediction/target points.

    pred_pts/target_pts: (M, 3) world points; weights: (M,) per-point
    weights (sample mask / centerness). Normalized by res like the
    reference (rpn.py compute_loss 2d branch / fcos loss.py:449-475).
    """
    K = jnp.asarray(DEFAULT_K if intrinsic is None else intrinsic)
    w2cs = jnp.asarray(get_w2cs(res))
    ones = jnp.ones((*pred_pts.shape[:-1], 1), pred_pts.dtype)
    pred_h = jnp.concatenate([pred_pts, ones], axis=-1)
    tgt_h = jnp.concatenate([target_pts, ones], axis=-1)

    def sl1(d):
        a = jnp.abs(d)
        return jnp.where(a < beta, 0.5 * a * a / beta, a - 0.5 * beta)

    # safe-where: zero-weight rows must not contribute inf*0 = NaN grads
    sel = weights > 0
    pred_h = jnp.where(sel[..., None], pred_h, tgt_h)
    # early-training decoded boxes can be wild (exp deltas) and cross the
    # camera plane, where the 1/z^2 projection gradient overflows f32 —
    # clamp points into a sane multiple of the grid and keep |z| >= res/4
    lim = 4.0 * res
    pred_h = jnp.concatenate(
        [jnp.clip(pred_h[..., :3], -lim, lim), pred_h[..., 3:]], axis=-1
    )
    z_eps = res / 4.0

    total = 0.0
    for i in range(w2cs.shape[0]):
        p2 = project(K, w2cs[i], pred_h, eps=z_eps)
        t2 = project(K, w2cs[i], tgt_h, eps=z_eps)
        per = jnp.sum(sl1(p2 - t2), axis=-1)  # (M,)
        total = total + jnp.sum(jnp.where(sel, per * weights, 0.0))
    return total / res
