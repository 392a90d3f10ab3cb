"""3D conv backbones producing 4-level 256-channel pyramids (flax, NDHWC).

Capability parity with ``nerf_rcnn/model/feature_extractor.py``:
VGG-FPN (stage configs A/B/D/E + split variants AF/DF/EF), ResNet-FPN
(Bottleneck, 256- and 64-channel variants), and the simplified debug
ResNets. The 3D Swin transformer lives in ``swin.py``.

Backbone contract (asserted upstream at nerf_rpn.py:87-99): callable on a
``(N, W, L, H, 4)`` RGBσ grid, returns a tuple of pyramid levels at
strides {4, 8, 16, 32}, and exposes ``out_channels``.

TPU notes: channels-last; GroupNorm in place of BatchNorm3d (see
layers.py); strided convs and SAME padding keep every level's spatial
dims exactly ``ceil(input / stride)`` so padding masks are computable
from grid sizes alone.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from instance_nerf_tpu.models.fpn import FPN
from instance_nerf_tpu.models.layers import ConvBlock, max_pool_3d, upsample_nearest_to

# VGG stage configs; "M" = maxpool, "F" = stage boundary (feature tap).
# Same shape language as the reference's vgg_cfgs table
# (feature_extractor.py:278-286).
VGG_CFGS = {
    "AF": [64, 128, "F", 256, 256, "M", "F", 512, 512, "M", "F", 512, 512, "M", "F"],
    "DF": [64, 64, 128, 128, "F", 256, 256, 256, "M", "F", 512, 512, 512, "M", "F",
           512, 512, 512, "M", "F"],
    "EF": [64, 64, 128, 128, "F", 256, 256, 256, 256, "M", "F", 512, 512, 512, 512,
           "M", "F", 512, 512, 512, 512, "M", "F"],
}


class VGG_FPN(nn.Module):
    """VGG-style backbone + FPN neck. Default config of the shipped
    training scripts (train_rpn.sh / train_rcnn.sh: ``vgg_EF``)."""

    cfg: str = "EF"
    in_channels: int = 4
    input_size: int = 160
    conv_at_start: bool = False
    out_channels: int = 256
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        cfg = VGG_CFGS[self.cfg]

        x_ds = None
        if self.conv_at_start:
            x = ConvBlock(32, dtype=self.dtype, name="start_conv1")(x)
            x = ConvBlock(32, dtype=self.dtype, name="start_conv2")(x)
            ds = ConvBlock(32, stride=2, dtype=self.dtype, name="ds_conv1")(x)
            ds = ConvBlock(32, stride=2, dtype=self.dtype, name="ds_conv2")(ds)
            x_ds = ConvBlock(128, kernel=1, dtype=self.dtype, name="ds_proj")(ds)

        # stem: stride 4 for large grids, stride 1 for small (ref:331-343)
        if self.input_size >= 160:
            x = ConvBlock(64, kernel=7, stride=2, dtype=self.dtype, name="stem")(x)
            x = max_pool_3d(x, window=3, stride=2)
        else:
            x = ConvBlock(64, kernel=7, stride=1, dtype=self.dtype, name="stem")(x)

        features = []
        stage, li = [], 0
        for v in cfg:
            if v == "M":
                stage.append(("pool", None))
            elif v == "F":
                for kind, feat in stage:
                    if kind == "pool":
                        x = max_pool_3d(x, window=2, stride=2)
                    else:
                        x = ConvBlock(feat, dtype=self.dtype, name=f"conv_{li}")(x)
                        li += 1
                stage = []
                features.append(x)
            else:
                stage.append(("conv", v))

        if self.conv_at_start and x_ds is not None:
            features[0] = features[0] + x_ds

        return FPN(
            out_channels=self.out_channels, num_outs=4, dtype=self.dtype
        )(features[-4:])


class Bottleneck(nn.Module):
    """3D ResNet bottleneck (1x1 stride-s, 3x3, 1x1 x4). Ref: 31-68."""

    planes: int
    stride: int = 1
    expansion: int = 4
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * self.expansion
        residual = x
        y = ConvBlock(self.planes, kernel=1, stride=self.stride, dtype=self.dtype)(x)
        y = ConvBlock(self.planes, kernel=3, dtype=self.dtype)(y)
        y = ConvBlock(out_ch, kernel=1, use_relu=False, dtype=self.dtype)(y)
        if self.stride != 1 or x.shape[-1] != out_ch:
            residual = ConvBlock(
                out_ch, kernel=1, stride=self.stride, use_relu=False,
                dtype=self.dtype, name="downsample",
            )(x)
        return nn.relu(y + residual)


class ResNet_FPN_256(nn.Module):
    """ResNet-FPN with built-in top-down pathway. Ref: 145-235.

    ``layers`` gives per-level block depths; output has len(layers)
    levels at 256 channels, strides {2 * 2^i} (stride 4.. with
    ``is_max_pool``).
    """

    layers: Sequence[int] = (3, 4, 6, 3)
    in_planes: int = 64
    is_max_pool: bool = False
    out_channels: int = 256
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = ConvBlock(self.in_planes, kernel=7, stride=2, dtype=self.dtype, name="stem")(x)
        if self.is_max_pool:
            x = max_pool_3d(x, window=3, stride=2)

        c_out = [x]
        for i, depth in enumerate(self.layers):
            planes = self.in_planes * (2 ** i)
            for b in range(depth):
                x = Bottleneck(
                    planes,
                    stride=(2 if (i > 0 and b == 0) else 1),
                    dtype=self.dtype,
                    name=f"layer{i}_block{b}",
                )(x)
            c_out.append(x)

        # top-down with lateral 1x1s
        p = nn.Conv(self.out_channels, (1, 1, 1), dtype=self.dtype,
                    name="lat_0")(c_out[-1])
        p_out = [p]
        for i in range(len(self.layers) - 1):
            lat = nn.Conv(self.out_channels, (1, 1, 1), dtype=self.dtype,
                          name=f"lat_{i+1}")(c_out[-2 - i])
            p = upsample_nearest_to(p_out[i], lat.shape[1:4]) + lat
            p = nn.Conv(self.out_channels, (3, 3, 3), padding="SAME",
                        dtype=self.dtype, name=f"smooth_{i}")(p)
            p_out.append(p)

        p_out.reverse()
        return tuple(p_out)


class ResNet_FPN_64(nn.Module):
    """Smaller stride-1-stem variant for 64^3 grids. Ref: 72-142."""

    layers: Sequence[int] = (2, 2, 2, 2)
    out_channels: int = 64
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = ConvBlock(16, kernel=7, stride=1, dtype=self.dtype, name="stem")(x)
        c_out = []
        for i, depth in enumerate(self.layers):
            planes = 16 * (2 ** i)
            for b in range(depth):
                x = Bottleneck(
                    planes,
                    stride=(2 if (i > 0 and b == 0) else 1),
                    dtype=self.dtype,
                    name=f"layer{i}_block{b}",
                )(x)
            c_out.append(x)

        p = nn.Conv(self.out_channels, (1, 1, 1), dtype=self.dtype, name="top")(c_out[-1])
        p_out = [p]
        for i in range(len(self.layers) - 1):
            lat = nn.Conv(self.out_channels, (1, 1, 1), dtype=self.dtype,
                          name=f"lat_{i}")(c_out[-2 - i])
            p = upsample_nearest_to(p_out[-1], lat.shape[1:4]) + lat
            p = nn.Conv(self.out_channels, (3, 3, 3), padding="SAME",
                        dtype=self.dtype, name=f"smooth_{i}")(p)
            p_out.append(p)
        p_out.reverse()
        return tuple(p_out)


class ResNetSimplified(nn.Module):
    """Single-level debug backbone (ref: ResNetSimplified_{64,256})."""

    out_channels: int = 64
    num_residuals: int = 3
    downsample: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = ConvBlock(
            self.out_channels,
            kernel=7,
            stride=2 if self.downsample else 1,
            dtype=self.dtype,
            name="stem",
        )(x)
        if self.downsample:
            x = max_pool_3d(x, window=3, stride=2)
        for i in range(self.num_residuals):
            y = ConvBlock(self.out_channels, dtype=self.dtype, name=f"res{i}_a")(x)
            y = ConvBlock(self.out_channels, use_relu=False, dtype=self.dtype,
                          name=f"res{i}_b")(y)
            x = nn.relu(x + y)
        return (x,)


def build_backbone(backbone_type: str, input_size: int = 160,
                   in_channels: int = 4, conv_at_start: bool = False,
                   dtype=None):
    """Backbone factory mirroring run_rcnn.py:429-447 / run_fcos.py:196-215."""
    if backbone_type.startswith("vgg"):
        cfg = backbone_type.split("_")[1] if "_" in backbone_type else "EF"
        return VGG_FPN(cfg=cfg, in_channels=in_channels, input_size=input_size,
                       conv_at_start=conv_at_start, dtype=dtype)
    if backbone_type == "resnet":
        return ResNet_FPN_256(is_max_pool=input_size >= 160, dtype=dtype)
    if backbone_type.startswith("swin"):
        from instance_nerf_tpu.models.swin import SwinTransformerFPN, swin_config

        return SwinTransformerFPN(**swin_config(backbone_type), dtype=dtype)
    raise ValueError(f"Unknown backbone type: {backbone_type}")
