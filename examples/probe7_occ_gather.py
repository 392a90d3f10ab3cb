"""probe7: the occupancy GATHER is the prefix wall (probe6: 5.2 ms of
9.3 at 4096x128 from a 128^3 f32 grid; u8/bitpack don't help; top_k is
0.5 ms). Variants measured here, all on the real TPU:

  occ_3d_f32      - baseline: grid[ix, iy, iz] advanced indexing
  occ_flat_f32    - ONE flat take from (G^3,) with precomputed flat idx
  occ_flat_u8     - flat take from u8
  occ_flat_2d     - flat take from (G^3//8, 8) rows (byte rows, lane-
                    friendly minor dim)
  occ_pool64      - flat take from a 2x max-pooled 64^3 grid (half the
                    address space; conservative skip)
  occ_mxu32       - 32^3 grid via factorized one-hot einsum (MXU, zero
                    gathers)
  occ_mxu64       - 64^3 grid via factorized one-hot einsum
  prefix_v2       - full redesigned prefix: flat-u8 pooled-64 gather +
                    value-encoded top_k + single t take_along
  prefix_v2_128   - same but gathering the full-res 128^3 flat u8

Chained-dependency timing, one readback, overhead-subtracted.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from instance_nerf_tpu.models.render import ray_aabb, sample_points  # noqa: E402

R, S, K, G = 4096, 128, 32, 128


def chained_ms(fn, args, reps=30):
    c = fn(jnp.float32(0), *args)
    float(c)
    t0 = time.perf_counter()
    c = jnp.float32(0)
    for _ in range(reps):
        c = fn(c, *args)
    float(c)
    return (time.perf_counter() - t0) / reps * 1000


def main():
    rng = np.random.default_rng(0)
    o = rng.normal(size=(R, 3))
    o = 0.5 + 1.5 * o / np.linalg.norm(o, axis=-1, keepdims=True)
    d = np.asarray([0.5, 0.5, 0.5]) - o + 0.1 * rng.normal(size=o.shape)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    occ_np = rng.uniform(size=(G, G, G)) < 0.25
    grid = jnp.asarray(occ_np.astype(np.float32) * 1e3)
    flat_f32 = jnp.asarray(occ_np.reshape(-1).astype(np.float32))
    flat_u8 = jnp.asarray(occ_np.reshape(-1).astype(np.uint8))
    rows_u8 = jnp.asarray(occ_np.reshape(-1, 8).astype(np.uint8))
    pool64_np = occ_np.reshape(64, 2, 64, 2, 64, 2).any(axis=(1, 3, 5))
    pool64 = jnp.asarray(pool64_np.reshape(-1).astype(np.uint8))
    pool32_np = occ_np.reshape(32, 4, 32, 4, 32, 4).any(axis=(1, 3, 5))
    mxu32 = jnp.asarray(pool32_np, jnp.bfloat16)
    mxu64 = jnp.asarray(pool64_np, jnp.bfloat16)
    key = jax.random.key(0)

    @jax.jit
    def trivial(c):
        return c + 1.0 - 1.0

    overhead = chained_ms(trivial, (), reps=50)

    def sample_xyz(o, d, c):
        near, far = ray_aabb(o + c * 0, d)
        far = jnp.maximum(far, near + 1e-4)
        xyz, t, dt = sample_points(key, o, d, S, near, far, True)
        return jnp.clip(xyz, 0.0, 1.0), t, near, far

    @jax.jit
    def occ_3d_f32(c, o, d, grid):
        xyz, *_ = sample_xyz(o, d, c)
        idx = jnp.clip((xyz * G).astype(jnp.int32), 0, G - 1)
        vals = grid[idx[..., 0], idx[..., 1], idx[..., 2]]
        return c + jnp.sum((vals > 0.01).astype(jnp.float32)) * 0 + 1

    def flat_idx(xyz, g):
        idx = jnp.clip((xyz * g).astype(jnp.int32), 0, g - 1)
        return (idx[..., 0] * g + idx[..., 1]) * g + idx[..., 2]

    @jax.jit
    def occ_flat_f32(c, o, d, flat):
        xyz, *_ = sample_xyz(o, d, c)
        vals = jnp.take(flat, flat_idx(xyz, G), axis=0)
        return c + jnp.sum(vals) * 0 + 1

    @jax.jit
    def occ_flat_u8(c, o, d, flat):
        xyz, *_ = sample_xyz(o, d, c)
        vals = jnp.take(flat, flat_idx(xyz, G), axis=0)
        return c + jnp.sum(vals.astype(jnp.float32)) * 0 + 1

    @jax.jit
    def occ_flat_2d(c, o, d, rows):
        xyz, *_ = sample_xyz(o, d, c)
        fi = flat_idx(xyz, G)
        r = jnp.take(rows, fi >> 3, axis=0)  # (R, S, 8)
        vals = jnp.take_along_axis(r, (fi & 7)[..., None], axis=-1)[..., 0]
        return c + jnp.sum(vals.astype(jnp.float32)) * 0 + 1

    @jax.jit
    def occ_pool64(c, o, d, flat):
        xyz, *_ = sample_xyz(o, d, c)
        vals = jnp.take(flat, flat_idx(xyz, 64), axis=0)
        return c + jnp.sum(vals.astype(jnp.float32)) * 0 + 1

    def mxu_occ(xyz, gridb, g):
        # nearest-cell one-hot along each axis -> 3 factorized einsums
        p = jnp.clip(xyz.reshape(-1, 3) * g, 0, g - 1)
        ci = p.astype(jnp.int32)
        ids = jnp.arange(g, dtype=jnp.int32)
        ox = (ci[:, 0:1] == ids[None]).astype(jnp.bfloat16)
        oy = (ci[:, 1:2] == ids[None]).astype(jnp.bfloat16)
        oz = (ci[:, 2:3] == ids[None]).astype(jnp.bfloat16)
        u = jnp.einsum("nx,xyz->nyz", ox, gridb,
                       preferred_element_type=jnp.float32)  # (N, g, g)
        v = jnp.einsum("ny,nyz->nz", oy, u.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        w = jnp.einsum("nz,nz->n", oz, v.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return w.reshape(xyz.shape[:-1])

    @jax.jit
    def occ_mxu32(c, o, d, gb):
        xyz, *_ = sample_xyz(o, d, c)
        vals = mxu_occ(xyz, gb, 32)
        return c + jnp.sum(vals) * 0 + 1

    @jax.jit
    def occ_mxu64(c, o, d, gb):
        xyz, *_ = sample_xyz(o, d, c)
        vals = mxu_occ(xyz, gb, 64)
        return c + jnp.sum(vals) * 0 + 1

    def prefix_v2_body(c, o, d, flat, g):
        near, far = ray_aabb(o + c * 0, d)
        far = jnp.maximum(far, near + 1e-4)
        xyz, t, dt = sample_points(key, o, d, S, near, far, True)
        xyz_c = jnp.clip(xyz, 0.0, 1.0)
        occ_all = jnp.take(flat, flat_idx(xyz_c, g), axis=0)
        sort_key = jnp.where(occ_all > 0, 0, S) + jax.lax.broadcasted_iota(
            jnp.int32, occ_all.shape, 1)
        neg_vals, _ = jax.lax.top_k(-sort_key, K)
        vals = -neg_vals
        keep = vals < S
        s_idx = jnp.where(keep, vals, vals - S)
        t_k = jnp.take_along_axis(t, s_idx, axis=1)
        xyz_k = jnp.clip(o[:, None, :] + t_k[..., None] * d[:, None, :],
                         0.0, 1.0)
        dt_k = jnp.broadcast_to(
            (jnp.maximum(far - near, 1e-6) / S)[:, None], t_k.shape)
        return c + (jnp.sum(xyz_k) + jnp.sum(t_k) + jnp.sum(dt_k)
                    + jnp.sum(keep)) * 0 + 1

    @jax.jit
    def prefix_v2(c, o, d, flat):
        return prefix_v2_body(c, o, d, flat, 64)

    @jax.jit
    def prefix_v2_128(c, o, d, flat):
        return prefix_v2_body(c, o, d, flat, G)

    out = {"overhead_ms": round(overhead, 3)}
    for name, fn, args in (
        ("occ_3d_f32", occ_3d_f32, (o, d, grid)),
        ("occ_flat_f32", occ_flat_f32, (o, d, flat_f32)),
        ("occ_flat_u8", occ_flat_u8, (o, d, flat_u8)),
        ("occ_flat_2d", occ_flat_2d, (o, d, rows_u8)),
        ("occ_pool64", occ_pool64, (o, d, pool64)),
        ("occ_mxu32", occ_mxu32, (o, d, mxu32)),
        ("occ_mxu64", occ_mxu64, (o, d, mxu64)),
        ("prefix_v2", prefix_v2, (o, d, pool64)),
        ("prefix_v2_128", prefix_v2_128, (o, d, flat_u8)),
    ):
        try:
            ms = chained_ms(fn, args) - overhead
            out[name] = round(ms, 3)
        except Exception as e:  # noqa: BLE001
            out[name] = f"ERR {type(e).__name__}: {str(e)[:120]}"
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
