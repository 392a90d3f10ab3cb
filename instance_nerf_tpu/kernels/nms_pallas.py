"""Pallas TPU kernel for the greedy-NMS suppression sweep.

The greedy sweep is inherently sequential (box i suppresses later boxes
only if i itself survived), so the XLA formulation is a K-step
``fori_loop`` whose every step dynamic-slices one row of the (K, K) IoU
matrix out of HBM — dispatch-dominated at K ~ 10^4. Here the same sweep
is one ``pallas_call`` with ``grid=(K,)``: Pallas double-buffers the row
DMA while the VPU updates a VMEM-resident suppression vector.

Mosaic constraint: dynamic indexing along the lane dimension is
unsupported, so the per-row "did i survive" read and the keep write are
expressed as iota-masked whole-vector ops.

The IoU matrix itself stays an XLA computation (dense, fused); only the
sequential sweep moves into the kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


ROWS_PER_STEP = 8  # sublane-aligned block height


def _sweep_kernel(iou_rows_ref, valid_ref, thresh_ref, keep_ref, suppressed_ref):
    step = pl.program_id(0)
    k = keep_ref.shape[1]

    @pl.when(step == 0)
    def _():
        suppressed_ref[:] = jnp.zeros((1, k), jnp.float32)
        keep_ref[:] = jnp.zeros((1, k), jnp.int32)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    # 8 sequential sweep rows per grid step (sublane-aligned block)
    for r in range(ROWS_PER_STEP):
        i = step * ROWS_PER_STEP + r
        sel = (col == i).astype(jnp.float32)
        # alive = row i not suppressed AND valid (iota-masked scalar reads;
        # Mosaic has no dynamic lane indexing)
        sup_i = jnp.sum(suppressed_ref[:] * sel)
        val_i = jnp.sum(valid_ref[:] * sel)
        alive = jnp.logical_and(sup_i == 0.0, val_i != 0.0)

        kill = jnp.logical_and(
            alive,
            jnp.logical_and(iou_rows_ref[r, :][None] > thresh_ref[0], col > i),
        )
        suppressed_ref[:] = jnp.maximum(
            suppressed_ref[:], kill.astype(jnp.float32)
        )
        keep_ref[:] = jnp.where(col == i, jnp.int32(alive), keep_ref[:])


def _pad_to(x, k_pad, fill):
    pad = k_pad - x.shape[-1]
    if pad == 0:
        return x
    cfg = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
    return jnp.pad(x, cfg, constant_values=fill)


def _sweep_fused_kernel(rows_ref, allt_ref, valid_ref, thresh_ref,
                        keep_ref, suppressed_ref):
    """Sweep with the IoU row computed IN-KERNEL from the boxes: the
    (K, K) IoU matrix never exists. ``rows_ref`` delivers this step's 8
    sweep-row boxes; ``allt_ref`` is the (8, K) boxes-transposed layout
    (rows 0-2 lo, 3-5 hi, 6 volume) resident in VMEM."""
    step = pl.program_id(0)
    k = keep_ref.shape[1]

    @pl.when(step == 0)
    def _():
        suppressed_ref[:] = jnp.zeros((1, k), jnp.float32)
        keep_ref[:] = jnp.zeros((1, k), jnp.int32)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    lo = [allt_ref[a, :][None] for a in range(3)]
    hi = [allt_ref[3 + a, :][None] for a in range(3)]
    vol = allt_ref[6, :][None]
    for r in range(ROWS_PER_STEP):
        i = step * ROWS_PER_STEP + r
        sel = (col == i).astype(jnp.float32)
        sup_i = jnp.sum(suppressed_ref[:] * sel)
        val_i = jnp.sum(valid_ref[:] * sel)
        alive = jnp.logical_and(sup_i == 0.0, val_i != 0.0)

        # IoU of box i vs all (exact box_iou_3d formula, ops/boxes.py:29)
        inter = jnp.float32(1.0)
        for a in range(3):
            l = jnp.maximum(lo[a], rows_ref[r, a])
            h = jnp.minimum(hi[a], rows_ref[r, 3 + a])
            inter = inter * jnp.maximum(h - l, 0.0)
        union = rows_ref[r, 6] + vol - inter
        iou_row = jnp.where(
            union > 0, inter / jnp.maximum(union, 1e-12), 0.0
        )

        kill = jnp.logical_and(
            alive, jnp.logical_and(iou_row > thresh_ref[0], col > i)
        )
        suppressed_ref[:] = jnp.maximum(
            suppressed_ref[:], kill.astype(jnp.float32)
        )
        keep_ref[:] = jnp.where(col == i, jnp.int32(alive), keep_ref[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def nms_boxes_pallas(
    sboxes: jnp.ndarray,  # (K, 6) score-ordered AABBs
    valid: jnp.ndarray,  # (K,) bool, score-ordered
    iou_threshold,
    interpret: bool = False,
) -> jnp.ndarray:
    """Greedy AABB NMS sweep with fused in-kernel IoU -> (K,) bool keep.

    Never materializes the (K, K) IoU matrix (433 MB at the 10.4k-
    candidate FCOS budget), so batched eval can vmap it safely. Keep
    decisions are identical to the dense path (same formula, same
    sequential semantics).
    """
    k = sboxes.shape[0]
    k_pad = -(-k // 128) * 128
    from instance_nerf_tpu.ops.boxes import aabb_volume

    vol = aabb_volume(sboxes)  # same volume computation as box_iou_3d
    rows = jnp.concatenate(
        [sboxes.astype(jnp.float32), vol[:, None].astype(jnp.float32)], -1
    )  # (K, 7)
    rows = jnp.pad(rows, ((0, k_pad - k), (0, 1)))  # (k_pad, 8)
    allt = rows.T  # (8, k_pad)
    valid_p = _pad_to(valid.astype(jnp.float32)[None], k_pad, 0.0)

    keep = pl.pallas_call(
        _sweep_fused_kernel,
        grid=(k_pad // ROWS_PER_STEP,),
        in_specs=[
            pl.BlockSpec((ROWS_PER_STEP, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, k_pad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, k_pad), jnp.float32)],
        interpret=interpret,
    )(rows, allt, valid_p, jnp.asarray([iou_threshold], jnp.float32))
    return keep[0, :k].astype(bool)


@functools.partial(jax.jit, static_argnames=("interpret",))
def nms_sweep_pallas(
    iou: jnp.ndarray,  # (K, K) score-ordered IoU matrix
    valid: jnp.ndarray,  # (K,) bool, score-ordered
    iou_threshold,
    interpret: bool = False,
) -> jnp.ndarray:
    """Greedy suppression sweep -> (K,) bool keep (score order)."""
    k = iou.shape[0]
    k_pad = -(-k // 128) * 128
    iou_p = _pad_to(_pad_to(iou, k_pad, 0.0).T, k_pad, 0.0).T  # (k_pad, k_pad)
    valid_p = _pad_to(valid.astype(jnp.float32)[None], k_pad, 0.0)  # (1, k_pad)

    keep = pl.pallas_call(
        _sweep_kernel,
        grid=(k_pad // ROWS_PER_STEP,),
        in_specs=[
            pl.BlockSpec((ROWS_PER_STEP, k_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, k_pad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, k_pad), jnp.float32)],
        interpret=interpret,
    )(iou_p, valid_p, jnp.asarray([iou_threshold], jnp.float32))
    return keep[0, :k].astype(bool)
