"""Multiresolution hash-grid NGP with an instance-logit head (flax).

Capability parity with the reference's torch-ngp fork (absent submodule,
SURVEY.md §2.10): Instant-NGP hash encoding (Müller et al. 2022 — see
PAPERS.md), sigma/color MLPs with spherical-harmonics view encoding, plus
the Instance-NeRF extension: an instance-logit head whose outputs are
alpha-composited along rays like color (README.md:47,61-65).

TPU design:
  * the per-level feature gather is one ``take`` from an (L, T, F) table
    (XLA lowers to dynamic-gather; its transpose is the scatter-add the
    CUDA kernels hand-wrote). A Pallas kernel can later tile table
    slices into VMEM; the XLA path is the correctness reference.
  * all MLPs are tiny matmuls over big ray-sample batches — MXU-shaped
    (batch x 64) with bf16 compute.
  * coordinates are in the unit cube [0, 1]^3.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# spatial hash primes (Instant-NGP eq. 4 convention)
HASH_PRIMES = np.array([1, 2654435761, 805459861], dtype=np.uint32)


CORNER_OFFSETS = np.array(
    [[dx, dy, dz] for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)],
    dtype=np.uint32,
)  # (8, 3)


def hash_encode(
    table: jnp.ndarray,  # (L, T, F)
    xyz: jnp.ndarray,  # (..., 3) in [0, 1]
    resolutions: np.ndarray,  # (L,) int
    chunk: int = 2 ** 16,
    pallas_grad: bool = False,
) -> jnp.ndarray:
    """Trilinear multiresolution hash encoding -> (..., L*F).

    TPU note: all L levels x 8 corners are fused into ONE flat gather of
    (chunk*L*8) rows from the flattened (L*T, F) table — a single large
    dynamic-gather is the fastest formulation XLA offers on TPU (~330 M
    rows/s on v5e; separate per-level takes serialize dispatch and
    halve throughput). Backward is the gather transpose (scatter-add).
    Point batches larger than ``chunk`` are processed under ``lax.map``
    so the (N, L, 8, 3) index intermediates stay bounded.
    """
    L, T, F = table.shape
    lead = xyz.shape[:-1]
    x_all = xyz.reshape(-1, 3)
    n_all = x_all.shape[0]

    if n_all > chunk:
        pad = (-n_all) % chunk
        xp = jnp.pad(x_all, ((0, pad), (0, 0)))
        xp = xp.reshape(-1, chunk, 3)
        out = jax.lax.map(
            lambda xc: _hash_encode_block(table, xc, resolutions,
                                          pallas_grad), xp
        )
        return out.reshape(-1, L * F)[:n_all].reshape(*lead, L * F)
    return _hash_encode_block(table, x_all, resolutions, pallas_grad).reshape(
        *lead, L * F)


def _hash_encode_block(table, x, resolutions, pallas_grad=False):
    L, T, F = table.shape
    n = x.shape[0]

    res = jnp.asarray(np.asarray(resolutions, np.int64), jnp.uint32)  # (L,)
    resf = res.astype(x.dtype)
    p = x[:, None, :] * (resf[None, :, None] - 1.0)  # (N, L, 3)
    p0 = jnp.floor(p)
    frac = p - p0
    i0 = p0.astype(jnp.uint32)

    # corners: (N, L, 8, 3), clamped so the +1 corner at xyz==1 stays in
    # range (weight 0 there; must not NaN-fill)
    c = i0[:, :, None, :] + jnp.asarray(CORNER_OFFSETS)[None, None]
    c = jnp.minimum(c, (res - 1)[None, :, None, None])

    # host-side: which levels fit densely (avoids uint64 on device)
    dense = jnp.asarray(np.asarray(resolutions, np.int64) ** 3 <= T)
    idx_dense = (c[..., 0] * res[None, :, None] + c[..., 1]) * res[None, :, None] + c[..., 2]
    h = (
        (c[..., 0] * HASH_PRIMES[0])
        ^ (c[..., 1] * HASH_PRIMES[1])
        ^ (c[..., 2] * HASH_PRIMES[2])
    )
    idx_hash = h % jnp.uint32(T)
    idx = jnp.where(dense[None, :, None], idx_dense, idx_hash)  # (N, L, 8)

    # flat gather from (L*T, F)
    lvl_off = (jnp.arange(L, dtype=jnp.uint32) * jnp.uint32(T))[None, :, None]
    flat_idx = (idx + lvl_off).astype(jnp.int32).reshape(-1)
    if pallas_grad:
        from instance_nerf_tpu.kernels.scatter_pallas import (
            gather_rows_pallas_grad,
        )

        # (N, L, 8) flat layout: levels split at trailing=8 (corners)
        gathered = gather_rows_pallas_grad(
            table.reshape(L * T, F), flat_idx, L, trailing=8
        )
    else:
        gathered = jnp.take(table.reshape(L * T, F), flat_idx, axis=0)
    # weighting in the gather's own flat (N*L, 8*F) layout — the
    # (N, L, 8, F) einsum forces tiny-minor-dim layouts that cost ~10 ms
    # of transposes at 131k pts (measured; see models/fast_encode.py)
    gathered = gathered.reshape(n * L, 8 * F)

    # trilinear weights (N*L, 8) -> repeated along F (corner-major
    # feature-minor row packing)
    w = jnp.where(jnp.asarray(CORNER_OFFSETS)[None] == 1,
                  frac.reshape(-1, 1, 3), 1.0 - frac.reshape(-1, 1, 3))
    w = w[..., 0] * w[..., 1] * w[..., 2]  # (N*L, 8)
    w_cf = jnp.repeat(w, F, axis=-1)  # (N*L, 8*F)
    feats = (gathered * w_cf).reshape(-1, 8, F).sum(axis=1)
    return feats.reshape(n, L * F)


def ngp_resolutions(n_levels: int = 16, base_res: int = 16, max_res: int = 2048):
    """Geometric progression of grid resolutions (NGP eq. 2-3)."""
    if n_levels == 1:
        return np.array([base_res])
    b = np.exp((np.log(max_res) - np.log(base_res)) / (n_levels - 1))
    return np.round(base_res * b ** np.arange(n_levels)).astype(np.int64)


def sh_encode_deg2(d: jnp.ndarray) -> jnp.ndarray:
    """Degree-2 real spherical harmonics of unit directions -> (..., 9)."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    return jnp.stack(
        [
            jnp.full_like(x, 0.28209479177387814),
            0.4886025119029199 * y,
            0.4886025119029199 * z,
            0.4886025119029199 * x,
            1.0925484305920792 * x * y,
            1.0925484305920792 * y * z,
            0.31539156525252005 * (3 * z * z - 1),
            1.0925484305920792 * x * z,
            0.5462742152960396 * (x * x - y * y),
        ],
        axis=-1,
    )


class InstanceNGP(nn.Module):
    """Hash-grid NeRF + instance-logit head.

    ``query(xyz)`` -> (sigma_raw, geo_feat); ``color(geo, dir)`` -> rgb;
    ``instance(geo)`` -> per-point instance logits (rendered like color,
    README.md:65). ``num_instances`` includes background/void at 0.
    """

    n_levels: int = 16
    table_size: int = 2 ** 19
    n_features: int = 2
    base_res: int = 16
    max_res: int = 2048
    geo_feat_dim: int = 15
    hidden: int = 64
    num_instances: int = 33
    dtype: jnp.dtype | None = None
    pallas_grad: bool = False  # hash-table grads via the Pallas kernel

    def setup(self):
        self.resolutions = ngp_resolutions(self.n_levels, self.base_res, self.max_res)
        self.table = self.param(
            "hash_table",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -1e-4, 1e-4),
            (self.n_levels, self.table_size, self.n_features),
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
        return hash_encode(self.table, xyz, self.resolutions,
                           pallas_grad=self.pallas_grad)

    def query(self, xyz):
        """(..., 3) -> (sigma_raw (...,), geo (..., geo_feat_dim))."""
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
        """Instance logits from (stop-gradient) geometry features — the
        instance field trains against matched masks without disturbing
        the radiance field (README.md:47 staged recipe)."""
        h = nn.relu(self.inst_mlp[0](jax.lax.stop_gradient(geo)))
        return self.inst_mlp[1](h)

    def __call__(self, xyz, viewdir):
        sigma_raw, geo = self.query(xyz)
        rgb = self.color(geo, viewdir)
        logits = self.instance(geo)
        return sigma_raw, rgb, logits


def density_activation(sigma_raw: jnp.ndarray) -> jnp.ndarray:
    """exp activation like instant-ngp (matches the detector's
    density_to_alpha convention, datasets.py:177-179)."""
    return jnp.exp(jnp.clip(sigma_raw, -15.0, 15.0))
