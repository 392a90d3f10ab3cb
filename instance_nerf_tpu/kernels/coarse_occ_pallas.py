"""Pallas coarse-occupancy lookup: one-hot MXU contraction with ALL
intermediates in VMEM.

The XLA path (``models/render.py coarse_occupancy_mxu``) evaluates the
max-pooled 32^3 occupancy at N sample points by factorized one-hot
einsums. probe20 MEASURED that XLA fuses the factorized chain — 0.44 ms
at N=262k, no (N, 32, 32) HBM intermediate — and that this kernel loses
3x to it at 32^3 (1.30 ms). The round-4b "1 GB HBM intermediate"
hypothesis that motivated this kernel was WRONG (BENCH_NOTES round-4c).

The kernel is kept only as the documented fallback for coarse grids too
large for XLA to fuse (the one-hot FLOPs grow as R^4; 64^3 already tips
the XLA path to 8.6 ms, probe7). It blocks N and keeps everything
on-chip:

  - the coarse grid, reshaped (32, R^2) bf16, is VMEM-resident across
    the whole grid (index_map pins block (0, 0) every step);
  - per block of B points: build the x one-hot (B, 32) bf16 by iota
    comparison, one MXU matmul -> u = ox @ grid2 (B, R^2) in VMEM,
    build the joint (y, z) one-hot mask and reduce: w = sum_p u * oyz.

HBM traffic per block: 3*B*4 bytes in (the cell indices), B*4 out —
~100x less than the XLA path. The reference's CUDA marcher reads a
bitfield per step inside the march loop (torch-ngp raymarching kernel,
absent submodule — SURVEY.md §2.10); the TPU analog is this batched
on-chip contraction.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(ix_ref, iyz_ref, grid_ref, out_ref):
    r = grid_ref.shape[0]
    b = ix_ref.shape[-1]
    ix = ix_ref[0]  # (B,) int32 x cell ids
    iyz = iyz_ref[0]  # (B,) int32 joint y*R+z cell ids
    ids_x = jax.lax.broadcasted_iota(jnp.int32, (b, r), 1)
    ox = (ix[:, None] == ids_x).astype(jnp.bfloat16)  # (B, R)
    u = jnp.dot(ox, grid_ref[:, :],
                preferred_element_type=jnp.float32)  # (B, R^2) VMEM
    ids_p = jax.lax.broadcasted_iota(jnp.int32, (b, r * r), 1)
    oyz = (iyz[:, None] == ids_p).astype(jnp.float32)
    out_ref[0] = jnp.sum(u * oyz, axis=-1)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def coarse_occ_lookup(cells: jnp.ndarray, grid: jnp.ndarray,
                      block: int = 4096,
                      interpret: bool = False) -> jnp.ndarray:
    """(N, 3) int32 coarse cell ids + (R, R, R) {0,1} grid -> (N,) f32.

    N must be a multiple of ``block`` (callers pad; render.py shapes are
    R_rays * S with both powers of two).

    MEASURED NEGATIVE at the in-step scale (probe20, N=262k, R=32):
    1.30 ms vs 0.44 ms for the XLA einsum chain — XLA fuses the
    factorized one-hot contraction well enough that the (N, 32, 32)
    intermediate never hits HBM, and the kernel's per-block one-hot
    builds on the VPU dominate. Kept as the fallback for coarse grids
    too large to fuse (R >= 64, where the XLA chain's FLOPs blow up —
    probe7 saw 64^3 one-hot einsums tip over at 8x the FLOPs).
    """
    n = cells.shape[0]
    r = grid.shape[0]
    assert n % block == 0, (n, block)
    grid2 = grid.reshape(r, r * r).astype(jnp.bfloat16)
    ix = cells[:, 0].reshape(1, n)
    iyz = (cells[:, 1] * r + cells[:, 2]).reshape(1, n)
    return pl.pallas_call(
        _kernel,
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec((1, block), lambda i: (0, i)),
            pl.BlockSpec((1, block), lambda i: (0, i)),
            pl.BlockSpec((r, r * r), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        interpret=interpret,
    )(ix, iyz, grid2)[0]
