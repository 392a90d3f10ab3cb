"""Paste fixed-resolution soft masks into full voxel grids.

Capability parity with ``paste_masks_in_image`` / ``_do_paste_mask``
(``nerf_rcnn/model/utils.py:645-782``): detectron2-style 3D paste —
trilinearly resample each roi's (m, m, m) probability mask into the full
(W, L, H) grid, threshold at 0.5.

TPU redesign: the reference chunks rois under a GPU_MEM_LIMIT and runs
grid_sample per chunk; here one vectorized inverse-trilinear gather per
roi under ``lax.map`` (sequential over rois, static shapes) — bool output
keeps peak memory at one f32 grid.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _paste_single(mask: jnp.ndarray, box: jnp.ndarray, grid_shape) -> jnp.ndarray:
    """(m0, m1, m2) soft mask + (6,) box -> (W, L, H) soft mask."""
    m0, m1, m2 = mask.shape
    w, l, h = grid_shape
    # voxel centers at integer coords; mask sample coordinate follows the
    # reference's align_corners=False grid_sample convention:
    # u = (x + 0.5 - x1) / (x2 - x1) * m - 0.5
    def axis_coords(size, lo, hi, m):
        x = jnp.arange(size, dtype=jnp.float32)
        return (x + 0.5 - lo) / jnp.maximum(hi - lo, 1e-6) * m - 0.5

    u = axis_coords(w, box[0], box[3], m0)
    v = axis_coords(l, box[1], box[4], m1)
    t = axis_coords(h, box[2], box[5], m2)

    def corner(c, size):
        # zero-padding semantics (grid_sample padding_mode='zeros'):
        # out-of-range taps contribute 0, so masks fade at box borders
        # instead of bleeding a voxel outward
        i0 = jnp.floor(c).astype(jnp.int32)
        i1 = i0 + 1
        f = c - i0
        w0 = (1 - f) * ((i0 >= 0) & (i0 < size)).astype(jnp.float32)
        w1 = f * ((i1 >= 0) & (i1 < size)).astype(jnp.float32)
        return jnp.clip(i0, 0, size - 1), jnp.clip(i1, 0, size - 1), w0, w1

    x0, x1, wx0, wx1 = corner(u, m0)
    y0, y1, wy0, wy1 = corner(v, m1)
    z0, z1, wz0, wz1 = corner(t, m2)

    # axis-separable gathers: three cheap per-axis takes per corner
    # instead of one (W*L*H)-row fancy-index gather — the full-grid
    # gather dominated RCNN inference (13.6 s/scene before this).
    out = 0.0
    for ix, wx in ((x0, wx0), (x1, wx1)):
        mx_ = jnp.take(mask, ix, axis=0)  # (W, m1, m2)
        for iy, wy in ((y0, wy0), (y1, wy1)):
            mxy = jnp.take(mx_, iy, axis=1)  # (W, L, m2)
            wxy = wx[:, None, None] * wy[None, :, None]
            for iz, wz in ((z0, wz0), (z1, wz1)):
                vals = jnp.take(mxy, iz, axis=2)  # (W, L, H)
                out = out + vals * (wxy * wz[None, None, :])
    return out


def paste_masks_in_image(
    masks: jnp.ndarray,  # (P, m, m, m) probabilities
    boxes: jnp.ndarray,  # (P, 6)
    grid_shape: tuple[int, int, int],
    threshold: float = 0.5,
) -> jnp.ndarray:
    """(P, W, L, H) masks; bool if threshold >= 0 else float."""
    fn = lambda args: _paste_single(args[0], args[1], grid_shape)
    soft = jax.lax.map(fn, (masks, boxes))
    if threshold >= 0:
        return soft >= threshold
    return soft
