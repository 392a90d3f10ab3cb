"""Box delta coders (AABB + midpoint-offset OBB), pure JAX.

Parity targets: ``nerf_rcnn/model/coder/AABB_coder.py`` and
``nerf_rcnn/model/coder/midpoint_offset_coder.py`` (OBBDetection-style
midpoint-offset representation extended to 3D).

Unlike the reference's list-of-tensors batching (``base_bbox_coder.py``),
everything here operates on fixed-shape ``(..., N, D)`` arrays — batch by
``vmap`` or a leading dim.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from instance_nerf_tpu.ops.boxes import obb2hbb, obb2poly, rectpoly2obb

BBOX_XFORM_CLIP = math.log(2000.0)


class AABBCoder:
    """(dx, dy, dz, dw, dh, dd) deltas between AABBs. Ref: AABB_coder.py."""

    def __init__(self, bbox_xform_clip: float = BBOX_XFORM_CLIP):
        self.bbox_xform_clip = bbox_xform_clip

    def encode(self, reference_boxes: jnp.ndarray, proposals: jnp.ndarray) -> jnp.ndarray:
        """Deltas mapping ``proposals`` -> ``reference_boxes`` (both (..., 6))."""
        ex_whd = proposals[..., 3:6] - proposals[..., 0:3]
        ex_ctr = proposals[..., 0:3] + 0.5 * ex_whd
        gt_whd = reference_boxes[..., 3:6] - reference_boxes[..., 0:3]
        gt_ctr = reference_boxes[..., 0:3] + 0.5 * gt_whd
        ex_whd = jnp.maximum(ex_whd, 1e-6)
        d_ctr = (gt_ctr - ex_ctr) / ex_whd
        d_whd = jnp.log(jnp.maximum(gt_whd, 1e-6) / ex_whd)
        return jnp.concatenate([d_ctr, d_whd], axis=-1)

    def decode(self, rel_codes: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
        """Apply (..., 6) deltas to (..., 6) reference boxes."""
        whd = boxes[..., 3:6] - boxes[..., 0:3]
        ctr = boxes[..., 0:3] + 0.5 * whd
        d_ctr = rel_codes[..., 0:3]
        d_whd = jnp.minimum(rel_codes[..., 3:6], self.bbox_xform_clip)
        pred_ctr = d_ctr * whd + ctr
        pred_whd = jnp.exp(d_whd) * whd
        half = 0.5 * pred_whd
        return jnp.concatenate([pred_ctr - half, pred_ctr + half], axis=-1)


class RotatedCoder:
    """7-param OBB delta coder (legacy two-stage path).
    Semantics: coder/rotated_coder.py — center deltas in the anchor's
    rotated frame, log sizes, angle delta normalized by 2π and wrapped
    into [-π/2, π/2) at decode."""

    def __init__(self, bbox_xform_clip: float = BBOX_XFORM_CLIP):
        self.bbox_xform_clip = bbox_xform_clip

    def encode(self, gt_rois: jnp.ndarray, ex_rois: jnp.ndarray) -> jnp.ndarray:
        """(..., 7) gt + (..., 7) anchors -> (..., 7) deltas."""
        coord = gt_rois[..., 0:3] - ex_rois[..., 0:3]
        c, s = jnp.cos(ex_rois[..., 6]), jnp.sin(ex_rois[..., 6])
        ew = jnp.maximum(ex_rois[..., 3], 1e-6)
        eh = jnp.maximum(ex_rois[..., 4], 1e-6)
        ed = jnp.maximum(ex_rois[..., 5], 1e-6)
        dx = (c * coord[..., 0] + s * coord[..., 1]) / ew
        dy = (-s * coord[..., 0] + c * coord[..., 1]) / eh
        dz = coord[..., 2] / ed
        dw = jnp.log(jnp.maximum(gt_rois[..., 3], 1e-6) / ew)
        dh = jnp.log(jnp.maximum(gt_rois[..., 4], 1e-6) / eh)
        dd = jnp.log(jnp.maximum(gt_rois[..., 5], 1e-6) / ed)
        da = (gt_rois[..., 6] - ex_rois[..., 6]) / (2 * jnp.pi)
        return jnp.stack([dx, dy, dz, dw, dh, dd, da], axis=-1)

    def decode(self, deltas: jnp.ndarray, ex_rois: jnp.ndarray) -> jnp.ndarray:
        c, s = jnp.cos(ex_rois[..., 6]), jnp.sin(ex_rois[..., 6])
        dw = jnp.minimum(deltas[..., 3], self.bbox_xform_clip)
        dh = jnp.minimum(deltas[..., 4], self.bbox_xform_clip)
        dd = jnp.minimum(deltas[..., 5], self.bbox_xform_clip)
        w, h, d = ex_rois[..., 3], ex_rois[..., 4], ex_rois[..., 5]
        px = deltas[..., 0] * w * c - deltas[..., 1] * h * s + ex_rois[..., 0]
        py = deltas[..., 0] * w * s + deltas[..., 1] * h * c + ex_rois[..., 1]
        pz = deltas[..., 2] * d + ex_rois[..., 2]
        pw = jnp.exp(dw) * w
        ph = jnp.exp(dh) * h
        pd = jnp.exp(dd) * d
        pa = (2 * jnp.pi) * deltas[..., 6] + ex_rois[..., 6]
        pa = pa % jnp.pi
        pa = jnp.where(pa > jnp.pi / 2, pa - jnp.pi, pa)
        return jnp.stack([px, py, pz, pw, ph, pd, pa], axis=-1)


class MidpointOffsetCoder:
    """8-param OBB deltas (dx,dy,dz,dw,dh,dd,da,db) against AABB anchors.
    Ref: midpoint_offset_coder.py (bbox2delta_sp / delta_sp2bbox).
    """

    def __init__(self, means=(0.0,) * 8, stds=(1.0,) * 8):
        self.means = jnp.asarray(means)
        self.stds = jnp.asarray(stds)

    def encode(self, gt_bboxes: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
        """gt OBB (..., 7) + AABB anchors (..., 6) -> deltas (..., 8)."""
        p_ctr = 0.5 * (anchors[..., 0:3] + anchors[..., 3:6])
        p_whd = jnp.maximum(anchors[..., 3:6] - anchors[..., 0:3], 1e-6)

        gz = gt_bboxes[..., 2]
        gd = gt_bboxes[..., 5]
        gt_2d = jnp.concatenate(
            [gt_bboxes[..., 0:2], gt_bboxes[..., 3:5], gt_bboxes[..., 6:7]], axis=-1
        )
        hbb = obb2hbb(gt_2d)
        poly = obb2poly(gt_2d)
        gx = 0.5 * (hbb[..., 0] + hbb[..., 2])
        gy = 0.5 * (hbb[..., 1] + hbb[..., 3])
        gw = jnp.maximum(hbb[..., 2] - hbb[..., 0], 1e-6)
        gh = jnp.maximum(hbb[..., 3] - hbb[..., 1], 1e-6)

        x_coor, y_coor = poly[..., 0::2], poly[..., 1::2]
        y_min = jnp.min(y_coor, axis=-1, keepdims=True)
        x_max = jnp.max(x_coor, axis=-1, keepdims=True)
        # midpoint of the top edge / right edge (reference's -1000 trick)
        ga = jnp.max(
            jnp.where(jnp.abs(y_coor - y_min) > 0.1, -1000.0, x_coor), axis=-1
        )
        gb = jnp.max(
            jnp.where(jnp.abs(x_coor - x_max) > 0.1, -1000.0, y_coor), axis=-1
        )

        dx = (gx - p_ctr[..., 0]) / p_whd[..., 0]
        dy = (gy - p_ctr[..., 1]) / p_whd[..., 1]
        dz = (gz - p_ctr[..., 2]) / p_whd[..., 2]
        dw = jnp.log(gw / p_whd[..., 0])
        dh = jnp.log(gh / p_whd[..., 1])
        dd = jnp.log(jnp.maximum(gd, 1e-6) / p_whd[..., 2])
        da = (ga - gx) / gw
        db = (gb - gy) / gh
        deltas = jnp.stack([dx, dy, dz, dw, dh, dd, da, db], axis=-1)
        return (deltas - self.means) / self.stds

    def decode(
        self,
        pred_deltas: jnp.ndarray,
        anchors: jnp.ndarray,
        wh_ratio_clip: float = 16 / 1000,
    ) -> jnp.ndarray:
        """deltas (..., 8) + AABB anchors (..., 6) -> OBB (..., 7)."""
        deltas = pred_deltas * self.stds + self.means
        dx, dy, dz, dw, dh, dd, da, db = jnp.moveaxis(deltas, -1, 0)
        max_ratio = abs(math.log(wh_ratio_clip))
        dw = jnp.clip(dw, -max_ratio, max_ratio)
        dh = jnp.clip(dh, -max_ratio, max_ratio)
        dd = jnp.clip(dd, -max_ratio, max_ratio)

        p_ctr = 0.5 * (anchors[..., 0:3] + anchors[..., 3:6])
        p_whd = anchors[..., 3:6] - anchors[..., 0:3]
        gw = p_whd[..., 0] * jnp.exp(dw)
        gh = p_whd[..., 1] * jnp.exp(dh)
        gd = p_whd[..., 2] * jnp.exp(dd)
        gx = p_ctr[..., 0] + p_whd[..., 0] * dx
        gy = p_ctr[..., 1] + p_whd[..., 1] * dy
        gz = p_ctr[..., 2] + p_whd[..., 2] * dz

        x1, y1 = gx - gw * 0.5, gy - gh * 0.5
        x2, y2 = gx + gw * 0.5, gy + gh * 0.5
        da = jnp.clip(da, -0.5, 0.5)
        db = jnp.clip(db, -0.5, 0.5)
        ga, _ga = gx + da * gw, gx - da * gw
        gb, _gb = gy + db * gh, gy - db * gh
        polys = jnp.stack([ga, y1, x2, gb, _ga, y2, x1, _gb], axis=-1)

        # rectangularize: rescale vertices to a common diagonal length
        center = jnp.stack([gx, gy] * 4, axis=-1)
        cp = polys - center
        diag = jnp.sqrt(cp[..., 0::2] ** 2 + cp[..., 1::2] ** 2)
        max_diag = jnp.max(diag, axis=-1, keepdims=True)
        scale = max_diag / jnp.maximum(diag, 1e-8)
        cp = cp * jnp.repeat(scale, 2, axis=-1)
        rectpolys = cp + center

        obb2d = rectpoly2obb(rectpolys)  # (..., 5)
        return jnp.concatenate(
            [
                obb2d[..., 0:2],
                gz[..., None],
                obb2d[..., 2:4],
                gd[..., None],
                obb2d[..., 4:5],
            ],
            axis=-1,
        )
