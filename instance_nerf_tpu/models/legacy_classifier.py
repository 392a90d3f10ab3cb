"""Legacy two-stage proposal classification path.

Capability parity with ``nerf_rcnn/model/detector.py`` (SURVEY.md §2.13 —
imported upstream but unused in shipped configs; kept for completeness):
``ProposalTargetLayer`` (fg/bg RoI sampling) maps to
``rcnn.select_training_samples``; ``ROIPool`` maps to
``ops.poolers.multiscale_roi_align_3d`` (the interpolation variant) —
this module supplies the remaining piece, the classification head that
scores precomputed proposals from pooled level features.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class ProposalClassifier(nn.Module):
    """Conv tower + MLP over pooled RoI features -> objectness/class
    scores (the `RCNN`/`Classification_Model` role, detector.py:441-626).
    """

    num_classes: int = 2  # background/foreground objectness by default
    conv_channels: Sequence[int] = (256, 256)
    rep_size: int = 512
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, pooled: jnp.ndarray):
        """pooled (..., w, l, h, C) RoI features -> (..., num_classes)."""
        lead = pooled.shape[:-4]
        x = pooled.reshape(-1, *pooled.shape[-4:])
        for i, ch in enumerate(self.conv_channels):
            x = nn.Conv(ch, (3, 3, 3), padding="SAME", dtype=self.dtype,
                        name=f"conv{i}")(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(self.rep_size, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(nn.Dense(self.rep_size, dtype=self.dtype, name="fc2")(x))
        scores = nn.Dense(self.num_classes, dtype=self.dtype, name="cls")(x)
        return scores.reshape(*lead, self.num_classes)
