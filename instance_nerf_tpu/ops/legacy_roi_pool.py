"""Legacy ROIPool — the two-stage classification path's RoI extractor.

Reproduces ``nerf_rcnn/model/detector.py:170-438`` (SURVEY.md §2.13):

* ``enlarge_roi`` — extents scaled by (1 + enlarge_scale)
  (detector.py:195-211).
* ``rotated_forward`` — a lattice of feature-voxel-spaced sample points
  laid out in the ROI's *rotated* frame, each sampled with the
  reference's idiosyncratic 8-corner weighting (detector.py:348-365):
  for each floor/ceil corner combination the weight is
  ``1 - |dx|*|dy|*|dz|`` (product of per-axis distances), the eight
  weighted corner features are summed and divided by 8, then multiplied
  by an in-bounds mask. This is NOT standard trilinear interpolation —
  it is replicated verbatim (golden-tested against a numpy port).
* extraction types (detector.py:380-390): ``pooling`` = adaptive
  max-pool with kernel ``ceil(grid/out)`` and zero padding;
  ``interpolation`` = trilinear resize to ``output_size`` with
  ``align_corners=True``.
* ``normal_forward`` (detector.py:407-438) — integer crop of the AABB
  (no interpolation) + the same adaptive max-pool.

TPU redesign: the reference loops rois in Python with data-dependent
grid sizes. Here every ROI samples a STATIC ``(G, G, G)`` lattice
(``G = max_grid``); positions beyond the ROI's actual
``ceil(extent/scale)`` grid are masked, and the adaptive pool's dynamic
kernel becomes a masked segment-max over statically-indexed cells.
Exact for rois whose voxel grid fits in ``G`` (the shipped legacy
configs: output 1-5^3, strides {2,4,8}); larger rois clamp to ``G``
cells (documented deviation).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def enlarge_roi_obb(rois: jnp.ndarray, enlarge_scale: float) -> jnp.ndarray:
    """(..., 7) [cx,cy,cz,w,h,d,theta]: extents * (1+s). detector.py:199-202."""
    return jnp.concatenate(
        [rois[..., :3], rois[..., 3:6] * (1.0 + enlarge_scale),
         rois[..., 6:]], axis=-1)


def enlarge_roi_aabb(rois: jnp.ndarray, enlarge_scale: float) -> jnp.ndarray:
    """(..., 6) corner-form AABB enlarged about its center. detector.py:203-211."""
    extent = (rois[..., 3:] - rois[..., :3]) / 2 * (1.0 + enlarge_scale)
    offset = (rois[..., 3:] + rois[..., :3]) / 2
    return jnp.concatenate([offset - extent, offset + extent], axis=-1)


def eight_corner_sample(feat: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """The reference's 8-corner weighted sampling (detector.py:348-365).

    Args:
      feat: (W, L, H, C) one level's feature grid (channels-last).
      pts: (..., 3) sample positions in feature-voxel coords.

    Returns (..., C); out-of-bounds points get exactly 0 (the reference's
    position_mask).
    """
    w, l, h, c = feat.shape
    size = jnp.asarray([w, l, h], pts.dtype) - 1.0
    in_bounds = jnp.all((pts >= 0) & (pts <= size), axis=-1)

    flat = feat.reshape(-1, c)
    acc = 0.0
    for a in range(2):
        for b in range(2):
            for d in range(2):
                fns = (jnp.floor if a == 0 else jnp.ceil,
                       jnp.floor if b == 0 else jnp.ceil,
                       jnp.floor if d == 0 else jnp.ceil)
                corner = jnp.stack(
                    [fns[i](pts[..., i]) for i in range(3)], axis=-1)
                cc = jnp.clip(corner, 0.0, size).astype(jnp.int32)
                idx = (cc[..., 0] * l + cc[..., 1]) * h + cc[..., 2]
                vals = jnp.take(flat, idx.reshape(-1), axis=0).reshape(
                    *idx.shape, c)
                # weight = 1 - |dx|*|dy|*|dz| against the UNCLIPPED corner
                # (detector.py:359-363), summed over all 8 corners, /8
                scale = (jnp.abs(pts[..., 0] - corner[..., 0])
                         * jnp.abs(pts[..., 1] - corner[..., 1])
                         * jnp.abs(pts[..., 2] - corner[..., 2]))
                acc = acc + vals * (1.0 - scale)[..., None]
    acc = acc / 8.0
    return acc * in_bounds[..., None].astype(acc.dtype)


def _adaptive_maxpool_masked(grid_feats, grid_size, output_size):
    """Reference adaptive max-pool (kernel ceil(gs/out), zero padding —
    detector.py:380-386) with static shapes: a masked segment-max that
    assigns lattice cell j to output cell j // ceil(gs/out).

    grid_feats: (G, G, G, C); grid_size: (3,) int dynamic; output_size:
    static (o0, o1, o2).
    """
    g = grid_feats.shape[0]
    out = jnp.asarray(output_size)
    kernel = jnp.ceil(grid_size / out).astype(jnp.int32)  # dynamic (3,)
    kernel = jnp.maximum(kernel, 1)

    res = grid_feats
    for ax, o in enumerate(output_size):
        j = jnp.arange(g)
        cell = j // kernel[ax]  # (G,) dynamic mapping
        valid = j < grid_size[ax]
        # one-hot (o, G) selection, masked; zero-pad semantics: invalid
        # positions contribute 0 (matches the reference's zero padding,
        # which participates in the max)
        sel = (cell[None, :] == jnp.arange(o)[:, None]) & valid[None, :]
        m = jnp.moveaxis(res, ax, 0)  # (G, ..., C)
        picked = jnp.where(
            sel.reshape(o, g, *([1] * (m.ndim - 1))),
            m[None], -jnp.inf,
        ).max(axis=1)
        # cells fully beyond grid_size only see padding zeros in the
        # reference -> 0 there; cells partially padded include 0 in max
        partial = (jnp.arange(o) * kernel[ax]) < grid_size[ax]
        pad_zero = ((jnp.arange(o) + 1) * kernel[ax]) > grid_size[ax]
        picked = jnp.where(
            partial.reshape(o, *([1] * (picked.ndim - 1))),
            jnp.where(pad_zero.reshape(o, *([1] * (picked.ndim - 1))),
                      jnp.maximum(picked, 0.0), picked),
            0.0,
        )
        res = jnp.moveaxis(picked, 0, ax)
    return res


def _trilinear_resize_ac(grid_feats, grid_size, output_size):
    """torch F.interpolate(..., mode='trilinear', align_corners=True) of
    the VALID (grid_size) sub-grid to output_size (detector.py:389)."""
    coords = []
    for ax, o in enumerate(output_size):
        n = grid_size[ax].astype(grid_feats.dtype)
        if o == 1:
            coords.append(jnp.zeros((1,), grid_feats.dtype))
        else:
            coords.append(jnp.arange(o) * (n - 1) / (o - 1))
    px, py, pz = jnp.meshgrid(*coords, indexing="ij")
    pts = jnp.stack([px, py, pz], axis=-1)  # (o0,o1,o2,3)
    # standard trilinear gather on the static G-lattice
    g = grid_feats.shape[0]
    c = grid_feats.shape[-1]
    lo = jnp.floor(pts)
    frac = pts - lo
    lo = jnp.clip(lo.astype(jnp.int32), 0, g - 1)
    hi = jnp.clip(lo + 1, 0, g - 1)
    flat = grid_feats.reshape(-1, c)

    def take(ix, iy, iz):
        idx = (ix * g + iy) * g + iz
        return jnp.take(flat, idx.reshape(-1), axis=0).reshape(*idx.shape, c)

    out = 0.0
    for a, wa in ((lo[..., 0], 1 - frac[..., 0]), (hi[..., 0], frac[..., 0])):
        for b, wb in ((lo[..., 1], 1 - frac[..., 1]), (hi[..., 1], frac[..., 1])):
            for d, wd in ((lo[..., 2], 1 - frac[..., 2]), (hi[..., 2], frac[..., 2])):
                out = out + take(a, b, d) * (wa * wb * wd)[..., None]
    return out


@functools.partial(
    jax.jit,
    static_argnames=("output_size", "max_grid", "extracting_type",
                     "enlarge_scale", "rotated"),
)
def legacy_roi_pool(
    level_feats: tuple,  # per level (Wl, Ll, Hl, C), channels-last
    rois: jnp.ndarray,  # (P, 7) obb [c,ext,theta] or (P, 6) corner aabb
    level_ids: jnp.ndarray,  # (P,) int
    spatial_scale: tuple,  # per level voxel stride, e.g. (2, 4, 8)
    output_size: tuple = (1, 1, 1),
    enlarge_scale: float = 0.2,
    extracting_type: str = "pooling",
    rotated: bool = True,
    max_grid: int = 32,
) -> jnp.ndarray:
    """Fixed-shape legacy ROIPool -> (P, o0, o1, o2, C).

    Computes every roi against every level then selects by ``level_ids``
    (static shapes; the legacy path's level count is <= 4).
    """
    p = rois.shape[0]
    g = max_grid
    if rotated:
        er = enlarge_roi_obb(rois, enlarge_scale)
        ctr, ext, theta = er[:, :3], er[:, 3:6], er[:, 6]
    else:
        er = enlarge_roi_aabb(rois, enlarge_scale)
        theta = jnp.zeros((p,), rois.dtype)

    lat = jnp.stack(jnp.meshgrid(*([jnp.arange(g, dtype=rois.dtype)] * 3),
                                 indexing="ij"), axis=-1)  # (G,G,G,3)
    per_level = []
    for lvl, (feat, scale) in enumerate(zip(level_feats, spatial_scale)):
        if rotated:
            # rois_grid_size = ceil(ext/scale) (detector.py:302-304)
            gs = jnp.ceil(ext / scale).astype(jnp.int32)
            origin = ctr / scale  # positions centered on the roi
        else:
            # integer crop [floor(lo/scale), floor(hi/scale)] inclusive
            # (detector.py:415-421) — positions are exact lattice points,
            # where the 8-corner weighting reduces to the identity.
            # Boundary deviation: the reference crops with a torch slice
            # FIRST (detector.py:423-428), so ROIs extending past the
            # feature extent (or with negative floor indices, which wrap
            # in torch) get a TRUNCATED crop and a correspondingly
            # smaller pooling kernel; here gs comes from the coordinates
            # and out-of-extent positions sample zeros instead. Only
            # interior ROIs (the normal case after enlarge+clip upstream)
            # match exactly — same caveat class as the >max_grid clamp.
            lo_i = jnp.floor(er[:, :3] / scale)
            hi_i = jnp.floor(er[:, 3:] / scale)
            gs = (hi_i - lo_i + 1).astype(jnp.int32)
            origin = lo_i
        gs = jnp.clip(jnp.maximum(gs, 1), 1, g)
        cth, sth = jnp.cos(theta), jnp.sin(theta)

        def sample_one(gs_i, ct, st, org):
            if rotated:
                # pos = R @ (grid - (gs-1)/2) + center/scale
                # (detector.py:327-336)
                pos = lat - (gs_i.astype(lat.dtype) - 1.0) / 2.0
                rx = ct * pos[..., 0] - st * pos[..., 1]
                ry = st * pos[..., 0] + ct * pos[..., 1]
                pos = jnp.stack([rx, ry, pos[..., 2]], axis=-1) + org
            else:
                pos = lat + org
            vals = eight_corner_sample(feat, pos)  # (G,G,G,C)
            inside = jnp.all(
                lat < gs_i.astype(lat.dtype), axis=-1)[..., None]
            return vals * inside.astype(vals.dtype)

        feats_all = jax.lax.map(
            lambda args: sample_one(*args), (gs, cth, sth, origin)
        )  # (P, G, G, G, C)
        if extracting_type == "pooling":
            pooled = jax.vmap(
                lambda f, s: _adaptive_maxpool_masked(f, s, output_size)
            )(feats_all, gs)
        elif extracting_type == "interpolation":
            pooled = jax.vmap(
                lambda f, s: _trilinear_resize_ac(f, s, output_size)
            )(feats_all, gs)
        else:
            raise NameError("Unknown feature_extracting_type")
        per_level.append(pooled)

    stacked = jnp.stack(per_level)  # (L, P, o, o, o, C)
    sel = jnp.clip(level_ids, 0, len(level_feats) - 1)
    return jnp.take_along_axis(
        stacked, sel[None, :, None, None, None, None], axis=0
    )[0]
