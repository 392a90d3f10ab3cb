"""Target assignment (Matcher) and balanced sampling — fixed-shape JAX.

Parity targets: ``nerf_rcnn/model/utils.py:37-213`` (torchvision-style
``Matcher`` with BELOW/BETWEEN sentinels + low-quality match recovery, and
``BalancedPositiveNegativeSampler``). The torch versions use boolean
indexing + ``randperm``; here everything is masks and keyed sorts so it
jits with static shapes (SURVEY.md §7.1).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

BELOW_LOW_THRESHOLD = -1
BETWEEN_THRESHOLDS = -2


def match_proposals(
    match_quality_matrix: jnp.ndarray,
    high_threshold: float,
    low_threshold: float,
    allow_low_quality_matches: bool = False,
    gt_valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Assign each prediction the best gt (or a negative sentinel).

    Args:
      match_quality_matrix: ``(M, N)`` gt x predictions quality (e.g. IoU).
      gt_valid: optional ``(M,)`` mask for padded gt rows.

    Returns:
      ``(N,)`` int32: matched gt index, or -1 (below low) / -2 (between).
    """
    quality = match_quality_matrix
    if gt_valid is not None:
        quality = jnp.where(gt_valid[:, None], quality, -1.0)

    matched_vals = jnp.max(quality, axis=0)
    all_matches = jnp.argmax(quality, axis=0).astype(jnp.int32)

    matches = jnp.where(
        matched_vals < low_threshold,
        BELOW_LOW_THRESHOLD,
        jnp.where(matched_vals < high_threshold, BETWEEN_THRESHOLDS, all_matches),
    )

    if allow_low_quality_matches:
        # For each gt: its max over predictions; predictions achieving that
        # max (ties included) are restored to their argmax gt.
        highest_per_gt = jnp.max(quality, axis=1, keepdims=True)
        is_best = quality == highest_per_gt
        if gt_valid is not None:
            is_best = jnp.logical_and(is_best, gt_valid[:, None])
        restore = jnp.any(is_best, axis=0)
        matches = jnp.where(restore, all_matches, matches)

    return matches.astype(jnp.int32)


class SampleResult(NamedTuple):
    pos_mask: jnp.ndarray  # (N,) bool
    neg_mask: jnp.ndarray  # (N,) bool


def _rank_within(key, member_mask: jnp.ndarray) -> jnp.ndarray:
    """Random rank of each member among members (non-members get big ranks)."""
    n = member_mask.shape[0]
    r = jax.random.uniform(key, (n,))
    r = jnp.where(member_mask, r, jnp.inf)
    order = jnp.argsort(r)
    ranks = jnp.zeros((n,), dtype=jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return ranks


def balanced_sample(
    key: jax.Array,
    matched_idxs: jnp.ndarray,
    batch_size_per_image: int,
    positive_fraction: float,
    valid: jnp.ndarray | None = None,
) -> SampleResult:
    """Sample a fixed-budget batch with a target positive fraction.

    ``matched_idxs`` follows the reference labeling convention at the
    sampler call sites: >= 1 positive, 0 negative, < 0 ignored
    (utils.py:66-76).
    """
    positive = matched_idxs >= 1
    negative = matched_idxs == 0
    if valid is not None:
        positive = jnp.logical_and(positive, valid)
        negative = jnp.logical_and(negative, valid)

    num_pos_target = int(batch_size_per_image * positive_fraction)
    num_pos = jnp.minimum(jnp.sum(positive), num_pos_target)
    num_neg = jnp.minimum(jnp.sum(negative), batch_size_per_image - num_pos)

    kp, kn = jax.random.split(key)
    pos_rank = _rank_within(kp, positive)
    neg_rank = _rank_within(kn, negative)
    pos_mask = jnp.logical_and(positive, pos_rank < num_pos)
    neg_mask = jnp.logical_and(negative, neg_rank < num_neg)
    return SampleResult(pos_mask, neg_mask)
