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


def max_pool_3d(x, window: int = 2, stride: int = 2, padding: str = "SAME"):
    """3D max pool on NDHWC. padding='SAME' reproduces ceil_mode=True."""
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
