"""Pallas TPU scatter-add kernel (the hash/brick-table gradient op).

XLA's scatter-add is the instance-field training wall: 16.8 M rows/s for
16-float rows on v5e (BENCH_NOTES.md). This kernel runs the same
accumulation at **43.4 M rows/s** (measured, bit-accurate to 1e-5 vs
``.at[].add`` — float summation order differs): a sequential grid walks
update tiles, indices arrive as BLOCKED SMEM operands (8 x 2048 int32 =
64 KB per step — a whole-array scalar prefetch of 2^20 indices is 4 MB
and exceeds the 1 MB SMEM budget, which was round-1's real blocker, not
Mosaic support), and the table output lives in VMEM revisited across
steps. The per-update ``out_ref[pl.ds(r, 1), :] += row`` dynamic-sublane
accumulate is supported by this Mosaic.

Constraints: table (T, W) must fit VMEM (T*W*4 bytes <= ~14 MB, e.g.
2^17 x 16 f32 = 8 MB — exactly one brick/hash level); N divisible by
ROWS*TILE (pad updates with index T-1/zero rows, or pre-mask).

Reference role: the torch-ngp CUDA grid backward (SURVEY.md §2.10/§2.17
native component #3).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 2048
ROWS = 8  # SMEM block second-to-last dim must be divisible by 8


def _scatter_kernel(idx_ref, upd_ref, out_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # nested (ROWS, TILE) loop: the flat form's per-iteration div/mod on
    # the SMEM index is ~1/3 of the loop cost (probe9: 41.7 -> 60.6 M
    # rows/s). Unrolling with duplicate-merge does NOT help — the
    # dynamic-sublane RMW dominates.
    def outer(j, _):
        def inner(k, _):
            # clamp: an out-of-range index must not write out of
            # bounds — callers pad with index 0 / zero rows, but a
            # corrupt index lands in row 0/T-1 instead of arbitrary VMEM
            r = jnp.clip(idx_ref[j, k], 0, out_ref.shape[0] - 1)
            out_ref[pl.ds(r, 1), :] += upd_ref[pl.ds(j * TILE + k, 1), :]
            return 0

        jax.lax.fori_loop(0, TILE, inner, 0)
        return 0

    jax.lax.fori_loop(0, ROWS, outer, 0)


def _make_replica_kernel(table_rows: int, replicas: int):
    """Scatter kernel with ``replicas`` disjoint accumulator copies of the
    table stacked in one (replicas*T, W) output. Each loop iteration
    issues ``replicas`` INDEPENDENT read-modify-writes (update i goes to
    copy i%replicas), breaking the serial RMW dependency chain that
    bounds the single-copy kernel (~60 M rows/s, probe9). The caller
    reduces the copies with one cheap XLA sum."""

    def kernel(idx_ref, upd_ref, out_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        def outer(j, _):
            def inner(k, _):
                col = k * replicas
                for rep in range(replicas):  # unrolled, disjoint copies
                    r = jnp.clip(idx_ref[j, col + rep], 0, table_rows - 1)
                    out_ref[pl.ds(r + rep * table_rows, 1), :] += upd_ref[
                        pl.ds(j * TILE + col + rep, 1), :
                    ]
                return 0

            jax.lax.fori_loop(0, TILE // replicas, inner, 0)
            return 0

        jax.lax.fori_loop(0, ROWS, outer, 0)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("table_rows", "interpret", "replicas")
)
def scatter_add_pallas(
    indices: jnp.ndarray,  # (N,) int32 row ids, N % (ROWS*TILE) == 0
    updates: jnp.ndarray,  # (N, W) f32 rows
    table_rows: int,
    interpret: bool = False,
    replicas: int = 1,
) -> jnp.ndarray:
    """sum-scatter ``updates`` into a zero (table_rows, W) table.

    Equivalent to ``jnp.zeros((table_rows, W)).at[indices].add(updates)``
    (accumulation order differs at float precision). Pad N up to a
    multiple of ROWS*TILE with zero update rows before calling.

    ``replicas`` > 1 accumulates into that many disjoint VMEM copies of
    the table (reduced at the end) to break the serial RMW chain; the
    (replicas * table_rows, W) stack must still fit VMEM.
    """
    n, w = updates.shape
    assert n % (ROWS * TILE) == 0, (
        f"N={n} must be a multiple of {ROWS * TILE}; pad with zero rows"
    )
    assert TILE % replicas == 0
    idx2d = indices.astype(jnp.int32).reshape(-1, TILE)
    if replicas == 1:
        kernel = _scatter_kernel
    else:
        kernel = _make_replica_kernel(table_rows, replicas)
    out = pl.pallas_call(
        kernel,
        grid=(n // (ROWS * TILE),),
        in_specs=[
            pl.BlockSpec((ROWS, TILE), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((ROWS * TILE, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((replicas * table_rows, w),
                                       jnp.float32),
        interpret=interpret,
    )(idx2d, updates)
    if replicas > 1:
        out = out.reshape(replicas, table_rows, w).sum(axis=0)
    return out


def scatter_add_padded(indices, updates, table_rows: int,
                       interpret: bool = False,
                       replicas: int = 1) -> jnp.ndarray:
    """``scatter_add_pallas`` for arbitrary N: pads updates with zero rows
    (index 0, exact — zero rows contribute nothing) up to ROWS*TILE."""
    n, w = updates.shape
    pad = (-n) % (ROWS * TILE)
    if pad:
        indices = jnp.concatenate(
            [indices, jnp.zeros((pad,), indices.dtype)])
        updates = jnp.concatenate(
            [updates, jnp.zeros((pad, w), updates.dtype)])
    return scatter_add_pallas(indices, updates, table_rows,
                              interpret=interpret, replicas=replicas)


def gather_rows_pallas_grad(table2d: jnp.ndarray, flat_idx: jnp.ndarray,
                            n_levels: int, trailing: int = 1,
                            replicas: int = 1) -> jnp.ndarray:
    """``jnp.take(table2d, flat_idx, axis=0)`` whose TABLE gradient runs
    through the Pallas scatter-add kernel instead of XLA's scatter.

    ``table2d`` is the flattened (L*T, W) multi-level table; the kernel
    needs each level's (T, W) slab VMEM-resident, so the backward makes
    one kernel call per level with that level's indices rebased to
    [0, T). Layout contract: ``flat_idx.reshape(-1, n_levels, trailing)``
    splits levels cleanly — brick_encode flattens (N, L) (trailing=1),
    hash_encode flattens (N, L, 8) corner-minor (trailing=8).

    Exactness: identical to ``.at[].add`` up to float summation order
    (tests assert 1e-5). Off-TPU the kernel runs in interpret mode.
    """
    return _gather_rows_pg(table2d, flat_idx, n_levels, trailing, replicas)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _gather_rows_pg(table2d, flat_idx, n_levels, trailing, replicas):
    return jnp.take(table2d, flat_idx, axis=0)


def _gather_rows_pg_fwd(table2d, flat_idx, n_levels, trailing, replicas):
    out = jnp.take(table2d, flat_idx, axis=0)
    return out, (flat_idx, table2d.shape)


def _gather_rows_pg_bwd(n_levels, trailing, replicas, res, d_out):
    flat_idx, (rows, w) = res
    L = n_levels
    T = rows // L
    interpret = jax.default_backend() != "tpu"
    per_lvl = flat_idx.reshape(-1, L, trailing)  # (N, L, trailing)
    d_lvl = d_out.reshape(-1, L, trailing, w)
    grads = []
    for l in range(L):
        idx_l = per_lvl[:, l].reshape(-1) - l * T  # rebase into [0, T)
        upd_l = d_lvl[:, l].reshape(-1, w)
        grads.append(
            scatter_add_padded(idx_l, upd_l, T, interpret=interpret,
                               replicas=replicas)
        )
    d_table = jnp.concatenate(grads, axis=0)  # (L*T, w)
    return d_table, None


_gather_rows_pg.defvjp(_gather_rows_pg_fwd, _gather_rows_pg_bwd)
