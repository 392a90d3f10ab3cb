"""Optimizer partitioning (parameter freezing).

The reference freezes the RPN backbone+head during RCNN training by
setting ``requires_grad=False`` (run_rcnn.py:403-427). The functional
equivalent: an ``optax.multi_transform`` that applies ``set_to_zero`` to
frozen subtrees.
"""
from __future__ import annotations

import jax
import optax


def partition_optimizer(tx, params, frozen_prefixes=("backbone",)):
    """Wrap ``tx`` so params under ``frozen_prefixes`` get zero updates."""

    def label(path, _):
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        for pref in frozen_prefixes:
            if pref in keys:
                return "frozen"
        return "train"

    labels = jax.tree_util.tree_map_with_path(label, params)
    return optax.multi_transform(
        {"train": tx, "frozen": optax.set_to_zero()}, labels
    )
