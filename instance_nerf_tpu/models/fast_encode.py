"""TPU-native fast field encoding: dense MXU base grid + brick-hash levels.

Why this exists (measured on v5e, BENCH_NOTES.md): XLA random-row gather
runs at ~95M rows/s regardless of row width up to ~16 floats, and
scatter-add (the gather transpose in backward) at ~22M rows/s; Mosaic on
this toolchain rejects every in-kernel dynamic-gather form. The reference
NGP encoding (torch-ngp CUDA, SURVEY.md §2.10) touches L×8 random rows
per point in each direction — 128 rows/pt at 16 levels — which caps any
faithful port at ~20k rays/s/chip no matter how the MLPs are written.

The TPU-native redesign cuts random rows per point to the number of
levels:

* **Dense base grid** — exact trilinear interpolation evaluated with
  factorized tent-weight contractions (``einsum`` over per-axis weight
  matrices), which XLA maps onto the MXU: zero random-access rows, exact
  gradients via einsum transposes (also MXU).
* **Brick-hash levels** — each level hashes the CELL (not the corner)
  and stores the cell's 2³ corner features packed in ONE table row;
  trilinear weighting happens inside the row. One gathered row per
  (point, level). Within a cell the field is exactly trilinear; at cell
  faces adjacent bricks may disagree (hash collisions aside, corner
  values are not shared), so level origins are STAGGERED by half a cell
  per level to keep seams from aligning across levels, and the MLP also
  receives low-frequency positional-encoding features to smooth across
  them. ``models/hashgrid.py`` keeps the exact shared-corner encoding as
  the correctness/quality reference.

Capability parity: drop-in replacement for InstanceNGP (query/color/
instance heads, instance logits composited like color — README.md:47,65).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from instance_nerf_tpu.models.hashgrid import (
    CORNER_OFFSETS,
    HASH_PRIMES,
    sh_encode_deg2,
)


def dense_trilinear(grid: jnp.ndarray, xyz: jnp.ndarray,
                    chunk: int = 8192) -> jnp.ndarray:
    """Exact trilinear interpolation of a dense (R, R, R, F) grid at
    ``xyz`` in [0, 1]^3 via factorized tent-weight matmuls (MXU-native,
    no gathers). Backward is the einsum transpose — also matmuls.
    """
    lead = xyz.shape[:-1]
    x = xyz.reshape(-1, 3)
    n = x.shape[0]
    if n > chunk:
        pad = (-n) % chunk
        xp = jnp.pad(x, ((0, pad), (0, 0))).reshape(-1, chunk, 3)
        out = jax.lax.map(lambda xc: _dense_trilinear_block(grid, xc), xp)
        return out.reshape(-1, grid.shape[-1])[:n].reshape(
            *lead, grid.shape[-1]
        )
    return _dense_trilinear_block(grid, x).reshape(*lead, grid.shape[-1])


def _dense_trilinear_block(grid, x):
    r = grid.shape[0]
    f = grid.shape[-1]
    p = jnp.clip(x, 0.0, 1.0) * (r - 1)  # (N, 3)
    ids = jnp.arange(r, dtype=p.dtype)
    # tent weights: w[n, a, i] = max(0, 1 - |i - p[n, a]|) — exactly the
    # linear-interpolation weights, two nonzeros per row
    w = jnp.maximum(0.0, 1.0 - jnp.abs(ids[None, None, :] - p[..., None]))
    wx, wy, wz = w[:, 0], w[:, 1], w[:, 2]
    u = jnp.einsum("nx,xyzf->nyzf", wx.astype(jnp.bfloat16),
                   grid.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    v = jnp.einsum("ny,nyzf->nzf", wy, u.astype(p.dtype))
    return jnp.einsum("nz,nzf->nf", wz, v)


def brick_encode(
    table: jnp.ndarray,  # (L, T, 8, F) packed corner features per cell
    xyz: jnp.ndarray,  # (..., 3) in [0, 1]
    resolutions: np.ndarray,  # (L,) static
    chunk: int = 2 ** 16,
    pallas_grad: bool = False,
    pallas_replicas: int = 1,
    table_cast: jnp.dtype | None = None,
) -> jnp.ndarray:
    """Brick-hash encoding: ONE gathered row per (point, level) -> (..., L*F).

    Level l's grid is offset by (l+1)/(L+1) of a cell so brick seams never
    align across levels. Dense levels (res^3 <= T) index directly (no
    collisions); finer levels hash the cell with the NGP primes.

    ``pallas_grad``: route the table gradient through the Pallas
    scatter-add kernel (kernels/scatter_pallas.py) instead of XLA's
    scatter — per-level (T, 8*F) slabs accumulate in VMEM. Exact up to
    float summation order.

    ``table_cast``: cast the (f32 master) table to this dtype before the
    gather — the gather and its transpose scatter move half the bytes at
    bf16; the f32 master still receives exact-dtype adam updates (the
    cast's VJP upcasts). Quality cover required (bf16 rounds reads).
    """
    L, T, C, F = table.shape
    lead = xyz.shape[:-1]
    x_all = xyz.reshape(-1, 3)
    n_all = x_all.shape[0]
    if n_all > chunk:
        pad = (-n_all) % chunk
        xp = jnp.pad(x_all, ((0, pad), (0, 0))).reshape(-1, chunk, 3)
        out = jax.lax.map(
            lambda xc: _brick_encode_block(table, xc, resolutions,
                                           pallas_grad, pallas_replicas,
                                           table_cast), xp
        )
        return out.reshape(-1, L * F)[:n_all].reshape(*lead, L * F)
    return _brick_encode_block(
        table, x_all, resolutions, pallas_grad, pallas_replicas, table_cast
    ).reshape(*lead, L * F)


def _brick_encode_block(table, x, resolutions, pallas_grad=False,
                        pallas_replicas=1, table_cast=None):
    L, T, C, F = table.shape
    if table_cast is not None:
        table = table.astype(table_cast)
    n = x.shape[0]
    res_np = np.asarray(resolutions, np.int64)
    res = jnp.asarray(res_np, jnp.uint32)
    resf = res.astype(x.dtype)

    # staggered level origins: offset l = (l+1)/(L+1) cells
    offs = (np.arange(L, dtype=np.float64) + 1.0) / (L + 1.0)
    offs_j = jnp.asarray(offs / np.maximum(res_np, 1), x.dtype)  # in [0,1]

    p = (jnp.clip(x, 0.0, 1.0)[:, None, :] + offs_j[None, :, None]) * (
        resf[None, :, None] - 1.0
    )  # (N, L, 3)
    cell = jnp.floor(p)
    frac = p - cell
    c = cell.astype(jnp.uint32)
    c = jnp.minimum(c, (res - 1)[None, :, None])  # (N, L, 3)

    dense = jnp.asarray(res_np ** 3 <= T)
    idx_dense = (c[..., 0] * res[None] + c[..., 1]) * res[None] + c[..., 2]
    h = (
        (c[..., 0] * HASH_PRIMES[0])
        ^ (c[..., 1] * HASH_PRIMES[1])
        ^ (c[..., 2] * HASH_PRIMES[2])
    )
    idx = jnp.where(dense[None], idx_dense, h % jnp.uint32(T))  # (N, L)

    lvl_off = (jnp.arange(L, dtype=jnp.uint32) * jnp.uint32(T))[None]
    flat = (idx + lvl_off).astype(jnp.int32).reshape(-1)  # (N*L,)
    if pallas_grad:
        from instance_nerf_tpu.kernels.scatter_pallas import (
            gather_rows_pallas_grad,
        )

        rows = gather_rows_pallas_grad(
            table.reshape(L * T, C * F), flat, L,
            replicas=pallas_replicas,
        )  # (N*L, 16)
    else:
        rows = jnp.take(table.reshape(L * T, C * F), flat, axis=0)

    # corner weighting in the FLAT (N*L, C*F) layout: the natural
    # (N, L, 8, F) einsum forces tiny-minor-dim (F=2) layouts that cost
    # ~10 ms of transposes at 131k points (measured on v5e — 17.3 ms vs
    # 7.0 ms for this formulation). Row packing is corner-major
    # feature-minor, so repeating w along F matches (c, f) exactly.
    w = jnp.where(
        jnp.asarray(CORNER_OFFSETS)[None] == 1,
        frac.reshape(-1, 1, 3), 1.0 - frac.reshape(-1, 1, 3),
    )
    w = w[..., 0] * w[..., 1] * w[..., 2]  # (N*L, 8)
    w_cf = jnp.repeat(w, F, axis=-1)  # (N*L, C*F)
    feats = (rows * w_cf).reshape(-1, C, F).sum(axis=1)  # (N*L, F)
    return feats.reshape(n, L * F)


def pe_encode(xyz: jnp.ndarray, n_freqs: int = 4) -> jnp.ndarray:
    """Low-frequency positional encoding -> (..., 6*n_freqs)."""
    freqs = (2.0 ** np.arange(n_freqs)) * np.pi
    ang = xyz[..., None, :] * jnp.asarray(freqs, xyz.dtype)[:, None]
    out = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    return out.reshape(*xyz.shape[:-1], 6 * n_freqs)


def brick_resolutions(n_levels: int = 6, base_res: int = 32,
                      max_res: int = 1024) -> np.ndarray:
    if n_levels == 1:
        return np.array([base_res])
    b = np.exp((np.log(max_res) - np.log(base_res)) / (n_levels - 1))
    return np.round(base_res * b ** np.arange(n_levels)).astype(np.int64)


def mask_to_instance_head(tree):
    """Zero every leaf of a grad/update pytree outside the instance head.

    The instance stage trains the instance MLP against a FROZEN NeRF
    (reference recipe: the instance field is trained on a fixed
    pretrained NGP, README.md:47-65). ``InstanceNGPFast.instance`` already
    stop-gradients its *input* features, but the CE loss still
    differentiates through the compositing weights w(sigma) — without
    this mask the density field warps per-view during instance training
    (observed: holdout rgb PSNR 37 -> 20 and displaced instance masks).
    Leaf paths containing a module named ``inst_*`` are kept; everything
    else (tables, sigma/color MLPs) is zeroed.
    """
    def _mask(path, leaf):
        keep = any(
            str(getattr(k, "key", "")).startswith("inst_") for k in path
        )
        return leaf if keep else jnp.zeros_like(leaf)

    return jax.tree_util.tree_map_with_path(_mask, tree)


class InstanceNGPFast(nn.Module):
    """TPU-native instance-field NeRF: dense MXU base + brick-hash levels.

    API-compatible with models/hashgrid.py:InstanceNGP (query/color/
    instance/__call__) so render_rays and the trainer take it unchanged.
    """

    n_levels: int = 6
    table_size: int = 2 ** 17
    n_features: int = 2
    base_res: int = 32  # coarsest brick level
    max_res: int = 1024
    dense_res: int = 16
    dense_features: int = 8
    pe_freqs: int = 4
    geo_feat_dim: int = 15
    hidden: int = 64
    num_instances: int = 33
    dtype: jnp.dtype | None = None
    pallas_grad: bool = False  # brick-table grads via the Pallas kernel
    pallas_replicas: int = 1  # VMEM accumulator copies in the kernel
    table_dtype: str | None = None  # cast table for gather/scatter (bf16)

    def setup(self):
        self.resolutions = brick_resolutions(
            self.n_levels, self.base_res, self.max_res
        )
        self.table = self.param(
            "brick_table",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -1e-4, 1e-4),
            (self.n_levels, self.table_size, 8, self.n_features),
        )
        self.dense_grid = self.param(
            "dense_grid",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -1e-4, 1e-4),
            (self.dense_res,) * 3 + (self.dense_features,),
        )
        self.sigma_mlp = [
            nn.Dense(self.hidden, dtype=self.dtype, name="sigma_0"),
            nn.Dense(1 + self.geo_feat_dim, dtype=self.dtype, name="sigma_1"),
        ]
        self.color_mlp = [
            nn.Dense(self.hidden, dtype=self.dtype, name="color_0"),
            nn.Dense(self.hidden, dtype=self.dtype, name="color_1"),
            nn.Dense(3, dtype=self.dtype, name="color_2"),
        ]
        self.inst_mlp = [
            nn.Dense(self.hidden, dtype=self.dtype, name="inst_0"),
            nn.Dense(self.num_instances, dtype=self.dtype, name="inst_1"),
        ]

    def encode(self, xyz):
        parts = [
            dense_trilinear(self.dense_grid, xyz),
            brick_encode(self.table, xyz, self.resolutions,
                         pallas_grad=self.pallas_grad,
                         pallas_replicas=self.pallas_replicas,
                         table_cast=(jnp.bfloat16
                                     if self.table_dtype == "bfloat16"
                                     else None)),
            pe_encode(xyz, self.pe_freqs),
        ]
        return jnp.concatenate(parts, axis=-1)

    def query(self, xyz):
        h = self.encode(xyz)
        h = nn.relu(self.sigma_mlp[0](h))
        h = self.sigma_mlp[1](h)
        return h[..., 0], h[..., 1:]

    def color(self, geo, viewdir):
        sh = sh_encode_deg2(viewdir)
        h = jnp.concatenate([geo, sh], axis=-1)
        h = nn.relu(self.color_mlp[0](h))
        h = nn.relu(self.color_mlp[1](h))
        return jax.nn.sigmoid(self.color_mlp[2](h))

    def instance(self, geo):
        h = nn.relu(self.inst_mlp[0](jax.lax.stop_gradient(geo)))
        return self.inst_mlp[1](h)

    def __call__(self, xyz, viewdir):
        sigma_raw, geo = self.query(xyz)
        rgb = self.color(geo, viewdir)
        logits = self.instance(geo)
        return sigma_raw, rgb, logits
