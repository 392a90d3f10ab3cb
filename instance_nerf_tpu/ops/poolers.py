"""Multi-scale RoIAlign-3D over FPN pyramids (fixed-shape).

Capability parity with ``nerf_rcnn/model/poolers.py`` +
``model/level_mapper.py``: FPN eq.(1) level assignment with
``canonical_scale=160`` on cube-root volume, per-level RoIAlign, scatter
back to roi order.

TPU redesign: instead of gathering dynamic per-level roi subsets
(poolers.py:115-188), every roi is pooled from every level and the
result is selected by a level one-hot — 4 static gathers instead of
data-dependent compaction. (A scalar-prefetch Pallas variant can cut the
4x gather cost later; the gathers are cheap next to the heads.)
"""
from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp

from instance_nerf_tpu.ops.boxes import aabb_volume
from instance_nerf_tpu.ops.roi_align import roi_align_3d


def map_levels(
    boxes: jnp.ndarray,
    k_min: int,
    k_max: int,
    canonical_scale: int = 160,
    canonical_level: int = 4,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """FPN eq.(1) on cube-root box volume -> level index in
    [0, k_max - k_min] (ref: poolers.py:24-61)."""
    s = jnp.cbrt(jnp.maximum(aabb_volume(boxes), 0.0))
    lvl = jnp.floor(canonical_level + jnp.log2(jnp.maximum(s, 1e-12) / canonical_scale) + eps)
    lvl = jnp.clip(lvl, k_min, k_max)
    return (lvl - k_min).astype(jnp.int32)


def multiscale_roi_align_3d(
    features: Sequence[jnp.ndarray],  # per level (N, w_l, l_l, h_l, C)
    boxes: jnp.ndarray,  # (N, P, 6) in input-grid coords
    out_size: tuple[int, int, int],
    input_shape: tuple[int, int, int],
    sampling_ratio: int = 1,
    canonical_scale: int = 160,
    canonical_level: int = 4,
) -> jnp.ndarray:
    """(N, P, ow, ol, oh, C) pooled features."""
    n, p = boxes.shape[:2]
    scales = [
        2.0 ** round(math.log2(f.shape[1] / input_shape[0])) for f in features
    ]
    k_min = int(-math.log2(scales[0]))
    k_max = int(-math.log2(scales[-1]))

    flat_boxes = boxes.reshape(n * p, 6)
    roi_batch = jnp.repeat(jnp.arange(n, dtype=jnp.int32), p)
    levels = map_levels(flat_boxes, k_min, k_max, canonical_scale, canonical_level)

    out = None
    for lvl, (feat, scale) in enumerate(zip(features, scales)):
        pooled = roi_align_3d(
            feat, flat_boxes, roi_batch, out_size,
            spatial_scale=scale, sampling_ratio=sampling_ratio,
        )  # (N*P, ow, ol, oh, C)
        sel = (levels == lvl).astype(pooled.dtype)[:, None, None, None, None]
        term = pooled * sel
        out = term if out is None else out + term
    return out.reshape(n, p, *out_size, features[0].shape[-1])
