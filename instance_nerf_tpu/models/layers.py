"""Shared 3D building blocks (flax.linen, channels-last NDHWC).

TPU design choices vs the reference (``nerf_rcnn/model/feature_extractor.py``):
  * layout is ``(N, W, L, H, C)`` — C on the 128-lane minor dim so XLA maps
    3D convs onto the MXU as implicit GEMMs.
  * GroupNorm everywhere the reference uses BatchNorm3d: per-example stats
    need no cross-replica sync under data parallelism (the FCOS head
    already uses GroupNorm(32) upstream, fcos/fcos.py:56), and inference
    behavior is training behavior — no running-stat state to carry through
    checkpoints.
  * ``dtype`` threads a bf16 compute / f32 param policy through every
    block (params stay f32; activations/matmuls run bf16 on the MXU).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvBlock(nn.Module):
    """Conv3D -> GroupNorm -> ReLU."""

    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 32
    use_norm: bool = True
    use_relu: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            kernel_size=(self.kernel,) * 3,
            strides=(self.stride,) * 3,
            padding="SAME",
            dtype=self.dtype,
            kernel_init=nn.initializers.he_normal(),
        )(x)
        if self.use_norm:
            x = nn.GroupNorm(
                num_groups=min(self.groups, x.shape[-1]), dtype=self.dtype
            )(x)
        if self.use_relu:
            x = nn.relu(x)
        return x


def _axis_max_pool_s2(x, axis: int, window: int):
    """Stride-2 max along one axis, reduce_window-SAME semantics, built
    from pad/reshape/slice + elementwise max only.

    Measured NEGATIVE on v5e (probe25): the hypothesis was that
    reduce_window's SelectAndScatter VJP is the slow path, but the
    reshape form's backward (eq-mask multiplies + pad-reduces over the
    80^3 x 64 stem activation) is SLOWER end-to-end — FCOS full step
    234.9 ms vs 178.2 ms stock. Kept as the documented alternative;
    the default stays ``reduce_window``.
    """
    n = x.shape[axis]
    out = -(-n // 2)
    if window == 1:
        return jax.lax.slice_in_dim(x, 0, n, stride=2, axis=axis)
    neg = jnp.finfo(x.dtype).min
    pad_total = max((out - 1) * 2 + window - n, 0)
    pad_lo = pad_total // 2
    cfg = [(0, 0, 0)] * x.ndim
    # pad high side to at least 2*out (+1 for the window-3 tail slice)
    need = 2 * out + (1 if window == 3 else 0)
    cfg[axis] = (pad_lo, need - n - pad_lo, 0)
    xp = jax.lax.pad(x, jnp.asarray(neg, x.dtype), cfg)
    pair_shape = xp.shape[:axis] + (out, 2) + xp.shape[axis + 1:]
    pairs = jnp.max(
        jax.lax.slice_in_dim(xp, 0, 2 * out, axis=axis).reshape(pair_shape),
        axis=axis + 1,
    )
    if window == 2:
        return pairs
    tail = jax.lax.slice_in_dim(xp, 2, 2 * out + 1, stride=2, axis=axis)
    return jnp.maximum(pairs, tail)


def max_pool_3d(x, window: int = 2, stride: int = 2, padding: str = "SAME",
                impl: str = "reduce_window"):
    """3D max pool on NDHWC. padding='SAME' reproduces ceil_mode=True.

    ``impl='reshape'`` uses the separable pad/reshape/max form —
    forward-identical to reduce_window with a dense-elementwise
    backward. probe25 measured it SLOWER than the stock
    SelectAndScatter backward on v5e (FCOS step 234.9 vs 178.2 ms),
    so ``reduce_window`` is the default.
    """
    if impl == "reshape" and stride == 2 and window in (1, 2, 3) \
            and padding == "SAME":
        for axis in (1, 2, 3):
            x = _axis_max_pool_s2(x, axis, window)
        return x
    return nn.max_pool(
        x,
        window_shape=(window,) * 3,
        strides=(stride,) * 3,
        padding=padding,
    )


def upsample_nearest_to(x, target_spatial: Sequence[int]):
    """Nearest-neighbor upsample NDHWC features to a target spatial shape.

    FPN top-down pathway (ref: fpn.py:150-156 F.interpolate nearest).
    Implemented as repeat + crop — pure reshape/broadcast, no gather.
    """
    n, w, l, h, c = x.shape
    tw, tl, th = target_spatial
    fw, fl, fh = -(-tw // w), -(-tl // l), -(-th // h)  # ceil factors
    x = jnp.repeat(x, fw, axis=1)[:, :tw]
    x = jnp.repeat(x, fl, axis=2)[:, :, :tl]
    x = jnp.repeat(x, fh, axis=3)[:, :, :, :th]
    return x
