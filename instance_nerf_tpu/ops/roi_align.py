"""3D RoIAlign — trilinear sampling over voxel feature grids (pure XLA).

Replaces the reference's absent ``RoIAlign.pytorch`` 3D CUDA submodule
(native component #2, SURVEY.md §2.9). Call-site contract reconstructed
from ``nerf_rcnn/model/utils.py:559-609``:
``roi_align_3d(input, rois (K,6)=(x1..z2), roi_inds (K,), out_w/l/h,
spatial_scale)`` with average pooling of trilinear samples;
``sampling_ratio`` accepted but non-functional upstream ("TODO: make
sampling_ratio work"), so one sample per bin center is the reference
behavior and our default.

TPU design notes:
  * channels-LAST layout ``(N, W, L, H, C)`` — C lands on the 128-lane
    minor dimension, so the 8-corner gathers and the FMA blend vectorize
    on the VPU, and the op fuses into the surrounding convs' layout.
  * the gather is expressed as one flat ``take`` over the flattened
    spatial grid — XLA lowers this to a single dynamic-gather; its
    transpose (scatter-add) gives the backward pass for free, which the
    reference needed a handwritten CUDA backward for.
  * everything is static-shaped: K rois, fixed output size, masked
    (not filtered) invalid rois.

Coordinate convention matches torchvision ``aligned=False``: sample
point for output cell ``i`` is ``x1*scale + (i+0.5)*bin``; voxel centers
sit at integer coordinates; out-of-range samples clamp (zero weight
outside [-1, size]).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def roi_align_3d(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    roi_batch: jnp.ndarray,
    out_size: tuple[int, int, int],
    spatial_scale: float = 1.0,
    sampling_ratio: int = 1,
) -> jnp.ndarray:
    """Average-pooled trilinear RoIAlign.

    Args:
      features: ``(N, W, L, H, C)`` voxel features (channels last).
      rois: ``(K, 6)`` boxes ``(x1, y1, z1, x2, y2, z2)`` in *input* grid
        coordinates (pre ``spatial_scale``).
      roi_batch: ``(K,)`` int — which batch element each roi reads.
      out_size: ``(ow, ol, oh)`` output resolution.
      sampling_ratio: samples per bin edge (S^3 per bin, averaged).
        1 == reference behavior.

    Returns:
      ``(K, ow, ol, oh, C)``.
    """
    ow, ol, oh = out_size
    s = max(int(sampling_ratio), 1)
    n, w, l, h, c = features.shape
    k = rois.shape[0]

    # integer features (e.g. uint8 GT voxel masks) are gathered in their
    # native dtype and promoted to f32 only AFTER the 8-corner gather —
    # converting the full grid first materializes an N*W*L*H f32 temp
    # (the 160^3x128-slot mask-target path was 6.25G of the RCNN train
    # step's HBM, /root/scratch/retrain2.log)
    integer_input = not jnp.issubdtype(features.dtype, jnp.floating)
    fdt = jnp.float32 if integer_input else features.dtype

    lo = rois[:, 0:3] * spatial_scale  # (K, 3)
    hi = rois[:, 3:6] * spatial_scale
    bin_sz = (hi - lo) / jnp.asarray([ow, ol, oh], fdt)  # (K, 3)

    def axis_coords(axis: int, res: int) -> jnp.ndarray:
        # (K, res*s): sample points along one axis
        cell = jnp.arange(res * s, dtype=fdt)
        # position of sub-sample j within bin i: (i + (j_in + 0.5)/s)
        offs = (cell // s) + ((cell % s) + 0.5) / s
        return lo[:, axis, None] + offs[None, :] * bin_sz[:, axis, None]

    xs = axis_coords(0, ow)  # (K, OW) with OW = ow*s
    ys = axis_coords(1, ol)
    zs = axis_coords(2, oh)

    def corner(coord, size):
        # clamp like torchvision: out-of-range (< -1 or > size) -> weight 0
        in_range = (coord >= -1.0) & (coord <= size)
        cc = jnp.clip(coord, 0.0, size - 1)
        c0 = jnp.floor(cc)
        frac = cc - c0
        i0 = c0.astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, size - 1)
        return i0, i1, frac, in_range.astype(coord.dtype)

    x0, x1, fx, mx = corner(xs, w)
    y0, y1, fy, my = corner(ys, l)
    z0, z1, fz, mz = corner(zs, h)

    # flat gather indices: ((b*W + x)*L + y)*H + z
    flat = features.reshape(n * w * l * h, c)
    base = roi_batch.astype(jnp.int32) * w  # (K,)

    def gather(ix, iy, iz):
        # ix (K,OW), iy (K,OL), iz (K,OH) -> (K, OW, OL, OH, C)
        idx = (
            ((base[:, None] + ix) * l)[:, :, None, None]
            + iy[:, None, :, None] * 1
        ) * h + iz[:, None, None, :]
        # expand: ((b*W+x)*L + y) * H + z
        # mode='clip': padded/invalid rois (oob batch idx) must yield
        # finite values, not NaN fill — downstream masking relies on it
        return jnp.take(flat, idx.reshape(-1), axis=0, mode="clip").reshape(
            k, ix.shape[1], iy.shape[1], iz.shape[1], c
        )

    wx0, wx1 = (1.0 - fx) * mx, fx * mx
    wy0, wy1 = (1.0 - fy) * my, fy * my
    wz0, wz1 = (1.0 - fz) * mz, fz * mz

    out = None
    for ix, wxs in ((x0, wx0), (x1, wx1)):
        for iy, wys in ((y0, wy0), (y1, wy1)):
            for iz, wzs in ((z0, wz0), (z1, wz1)):
                vals = gather(ix, iy, iz)
                if integer_input:
                    vals = vals.astype(fdt)
                wgt = (
                    wxs[:, :, None, None]
                    * wys[:, None, :, None]
                    * wzs[:, None, None, :]
                )[..., None]
                # accumulate in the FEATURE dtype: promoting bf16
                # features to f32 here doubles the (K, OW, OL, OH, C)
                # temps that dominate the mask branch's peak HBM (the
                # spc>2 RCNN scan OOM, chain3) — corner weights round to
                # bf16 only when the caller already chose bf16 compute
                term = vals * wgt.astype(vals.dtype)
                out = term if out is None else out + term

    if s > 1:
        out = out.reshape(k, ow, s, ol, s, oh, s, c).mean(axis=(2, 4, 6))
    return out


def project_masks_on_boxes(
    gt_masks: jnp.ndarray,
    boxes: jnp.ndarray,
    mask_size: tuple[int, int, int],
) -> jnp.ndarray:
    """Crop ground-truth voxel masks to proposal boxes at mask resolution.

    Semantics: ``nerf_rcnn/model/nerf_rcnn.py:819-831`` (roi_align_3d of
    the binary GT mask grid, one mask per roi).

    Args:
      gt_masks: ``(K, W, L, H)`` float/bool — mask i is cropped by box i.
      boxes: ``(K, 6)``.

    Returns:
      ``(K, mw, ml, mh)`` float in [0, 1].
    """
    k = gt_masks.shape[0]
    feats = gt_masks[..., None].astype(jnp.float32)  # (K, W, L, H, 1)
    out = roi_align_3d(
        feats, boxes, jnp.arange(k), mask_size, spatial_scale=1.0
    )
    return out[..., 0]
