"""probe6: decompose + redesign the ray-prefix (sampling -> occupancy ->
fixed-K compaction) that costs 8.7 ms of the 20.9 ms instance-field step
(BENCH_NOTES probe5). Measures, on the real TPU:

  prefix_cur      - render_rays' current prefix (sample_points + f32 occ
                    gather + top_k + 3 take_alongs) in isolation
  occ_f32         - the occupancy gather alone, f32 grid
  occ_u8          - occupancy gather from a uint8 grid
  occ_bitpack     - occupancy gather from a z-bitpacked (G,G,G/8) uint8
  topk_only       - top_k(RxS -> K) alone
  prefix_value    - redesigned prefix: ONE top_k whose values encode the
                    sample id (s = key % S), keep = value < S; t gathered
                    with one (R,K) take_along; xyz recomputed as o + t*d;
                    dt closed-form (span/S)
  prefix_onehot   - cumsum-rank + one-hot einsum compaction (no sort)

Chained-dependency timing, one readback, overhead-subtracted (CLAUDE.md).
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

from instance_nerf_tpu.models.render import (  # noqa: E402
    OccupancyGrid,
    ray_aabb,
    sample_points,
)

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
    grid_np = (rng.uniform(size=(G, G, G)) < 0.25).astype(np.float32) * 1e3
    grid = jnp.asarray(grid_np)
    grid_u8 = jnp.asarray(grid_np > 0.01, jnp.uint8)
    bits_np = np.packbits((grid_np > 0.01).reshape(G, G, G // 8, 8),
                          axis=-1, bitorder="little")[..., 0]
    bits = jnp.asarray(bits_np)  # (G, G, G/8) uint8
    occ = OccupancyGrid(grid, 0.01)
    key = jax.random.key(0)

    @jax.jit
    def trivial(c):
        return c + 1.0 - 1.0

    overhead = chained_ms(trivial, (), reps=50)

    # -- current prefix ---------------------------------------------------
    @jax.jit
    def prefix_cur(c, o, d, grid):
        occ_ = OccupancyGrid(grid, 0.01)
        near, far = ray_aabb(o + c * 0, d)
        far = jnp.maximum(far, near + 1e-4)
        xyz, t, dt = sample_points(key, o, d, S, near, far, True)
        xyz_c = jnp.clip(xyz, 0.0, 1.0)
        occ_all = occ_.occupied(xyz_c)
        sort_key = jnp.where(occ_all > 0, 0, S) + jax.lax.broadcasted_iota(
            jnp.int32, occ_all.shape, 1)
        _, order = jax.lax.top_k(-sort_key, K)
        keep = jnp.take_along_axis(sort_key, order, axis=1) < S
        xyz_k = jnp.take_along_axis(xyz_c, order[..., None], axis=1)
        t_k = jnp.take_along_axis(t, order, axis=1)
        dt_k = jnp.take_along_axis(dt, order, axis=1)
        return c + (jnp.sum(xyz_k) + jnp.sum(t_k) + jnp.sum(dt_k)
                    + jnp.sum(keep)) * 0 + 1

    # -- occupancy gathers ------------------------------------------------
    def occ_idx(o, d, c):
        near, far = ray_aabb(o + c * 0, d)
        far = jnp.maximum(far, near + 1e-4)
        xyz, t, dt = sample_points(key, o, d, S, near, far, True)
        xyz_c = jnp.clip(xyz, 0.0, 1.0)
        idx = jnp.clip((xyz_c * G).astype(jnp.int32), 0, G - 1)
        return idx, t

    @jax.jit
    def occ_f32(c, o, d, grid):
        idx, _ = occ_idx(o, d, c)
        vals = grid[idx[..., 0], idx[..., 1], idx[..., 2]]
        return c + jnp.sum((vals > 0.01).astype(jnp.float32)) * 0 + 1

    @jax.jit
    def occ_u8(c, o, d, grid_u8):
        idx, _ = occ_idx(o, d, c)
        vals = grid_u8[idx[..., 0], idx[..., 1], idx[..., 2]]
        return c + jnp.sum(vals.astype(jnp.float32)) * 0 + 1

    @jax.jit
    def occ_bitpack(c, o, d, bits):
        idx, _ = occ_idx(o, d, c)
        byte = bits[idx[..., 0], idx[..., 1], idx[..., 2] >> 3]
        bit = (byte >> (idx[..., 2] & 7).astype(jnp.uint8)) & jnp.uint8(1)
        return c + jnp.sum(bit.astype(jnp.float32)) * 0 + 1

    # -- top_k alone ------------------------------------------------------
    keys_const = jnp.asarray(
        rng.integers(0, 2 * S, (R, S)).astype(np.int32))

    @jax.jit
    def topk_only(c, sk):
        v, _ = jax.lax.top_k(-(sk + c.astype(jnp.int32) * 0), K)
        return c + jnp.sum(v).astype(jnp.float32) * 0 + 1

    # -- redesigned value-encoded prefix ----------------------------------
    @jax.jit
    def prefix_value(c, o, d, grid_u8):
        near, far = ray_aabb(o + c * 0, d)
        far = jnp.maximum(far, near + 1e-4)
        xyz, t, dt = sample_points(key, o, d, S, near, far, True)
        xyz_c = jnp.clip(xyz, 0.0, 1.0)
        idx = jnp.clip((xyz_c * G).astype(jnp.int32), 0, G - 1)
        occ_all = grid_u8[idx[..., 0], idx[..., 1], idx[..., 2]]
        sort_key = jnp.where(occ_all > 0, 0, S) + jax.lax.broadcasted_iota(
            jnp.int32, occ_all.shape, 1)
        neg_vals, _ = jax.lax.top_k(-sort_key, K)  # values only
        vals = -neg_vals
        keep = vals < S
        s_idx = jnp.where(keep, vals, vals - S)  # (R, K) sample ids
        t_k = jnp.take_along_axis(t, s_idx, axis=1)  # one (R,K) gather
        xyz_k = jnp.clip(o[:, None, :] + t_k[..., None] * d[:, None, :],
                         0.0, 1.0)
        dt_k = jnp.broadcast_to(
            (jnp.maximum(far - near, 1e-6) / S)[:, None], t_k.shape)
        return c + (jnp.sum(xyz_k) + jnp.sum(t_k) + jnp.sum(dt_k)
                    + jnp.sum(keep)) * 0 + 1

    # -- one-hot einsum compaction ----------------------------------------
    @jax.jit
    def prefix_onehot(c, o, d, grid_u8):
        near, far = ray_aabb(o + c * 0, d)
        far = jnp.maximum(far, near + 1e-4)
        xyz, t, dt = sample_points(key, o, d, S, near, far, True)
        xyz_c = jnp.clip(xyz, 0.0, 1.0)
        idx = jnp.clip((xyz_c * G).astype(jnp.int32), 0, G - 1)
        occ_all = grid_u8[idx[..., 0], idx[..., 1], idx[..., 2]] > 0
        rank = jnp.cumsum(occ_all.astype(jnp.int32), axis=1) - 1
        sel = occ_all & (rank < K)  # (R, S)
        e = (rank[:, None, :] == jnp.arange(K)[None, :, None]) & sel[:, None, :]
        eb = e.astype(jnp.bfloat16)  # (R, K, S)
        packed = jnp.concatenate(
            [t[..., None], jnp.ones_like(t)[..., None]], axis=-1
        )  # (R, S, 2): t and keep indicator
        outp = jnp.einsum("rks,rsc->rkc", eb, packed.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
        t_k, keep = outp[..., 0], outp[..., 1]
        xyz_k = jnp.clip(o[:, None, :] + t_k[..., None] * d[:, None, :],
                         0.0, 1.0)
        return c + (jnp.sum(xyz_k) + jnp.sum(t_k) + jnp.sum(keep)) * 0 + 1

    out = {"overhead_ms": round(overhead, 3)}
    for name, fn, args in (
        ("prefix_cur", prefix_cur, (o, d, grid)),
        ("occ_f32", occ_f32, (o, d, grid)),
        ("occ_u8", occ_u8, (o, d, grid_u8)),
        ("occ_bitpack", occ_bitpack, (o, d, bits)),
        ("topk_only", topk_only, (keys_const,)),
        ("prefix_value", prefix_value, (o, d, grid_u8)),
        ("prefix_onehot", prefix_onehot, (o, d, grid_u8)),
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
