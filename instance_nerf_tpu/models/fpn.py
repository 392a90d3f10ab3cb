"""3D Feature Pyramid Network neck (flax, NDHWC).

Capability parity with the reference's mmdet-derived neck
(``nerf_rcnn/model/fpn.py``): lateral 1x1 convs, nearest-upsample
top-down sums, 3x3 smoothing convs, optional extra levels (maxpool or
strided conv on input/lateral/output).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from instance_nerf_tpu.models.layers import max_pool_3d, upsample_nearest_to


class FPN(nn.Module):
    out_channels: int = 256
    num_outs: int = 4
    add_extra_convs: str | bool = False  # False | 'on_input' | 'on_lateral' | 'on_output'
    relu_before_extra_convs: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]):
        num_ins = len(inputs)
        laterals = [
            nn.Conv(
                self.out_channels,
                kernel_size=(1, 1, 1),
                dtype=self.dtype,
                kernel_init=nn.initializers.xavier_uniform(),
                name=f"lateral_{i}",
            )(inputs[i])
            for i in range(num_ins)
        ]

        # top-down pathway
        for i in range(num_ins - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + upsample_nearest_to(
                laterals[i], laterals[i - 1].shape[1:4]
            )

        outs = [
            nn.Conv(
                self.out_channels,
                kernel_size=(3, 3, 3),
                padding="SAME",
                dtype=self.dtype,
                kernel_init=nn.initializers.xavier_uniform(),
                name=f"fpn_conv_{i}",
            )(laterals[i])
            for i in range(num_ins)
        ]

        # extra levels
        extra = self.num_outs - num_ins
        if extra > 0:
            if not self.add_extra_convs:
                for _ in range(extra):
                    outs.append(max_pool_3d(outs[-1], window=1, stride=2))
            else:
                if self.add_extra_convs == "on_input":
                    source = inputs[-1]
                elif self.add_extra_convs == "on_lateral":
                    source = laterals[-1]
                else:  # 'on_output' / True
                    source = outs[-1]
                for i in range(extra):
                    if i > 0:
                        source = outs[-1]
                        if self.relu_before_extra_convs:
                            source = nn.relu(source)
                    outs.append(
                        nn.Conv(
                            self.out_channels,
                            kernel_size=(3, 3, 3),
                            strides=(2, 2, 2),
                            padding="SAME",
                            dtype=self.dtype,
                            name=f"extra_conv_{i}",
                        )(source)
                    )
        return tuple(outs)
