"""probe17: decompose the FUSED bucketed rgb step (bktB, T=2^15 L3F4).

probe16 showed fusion and ray-batch scaling are NOT levers (both < 5%):
the 5.6 ms step is per-point/per-sample bound. This isolates the parts
at the shipping config (R=4096, S=128, buckets 0.5:4/0.25:8/0.25:16 ->
32768 compacted points):

  prefix        sample_points + coarse-MXU occ + hits/argsort + per-
                bucket top_k compaction + fine mask (everything before
                the field query)
  dense_fwd/bwd dense_trilinear (16^3 F8 MXU base) at 32k pts
  dense_c32k    same with chunk=32768 (kill the lax.map serialization)
  brick_fwd/bwd brick_encode (3 levels, T=2^15, F4) at 32k pts
  brick_bf16    same with table cast to bf16 (half gather/scatter bytes)
  pe_bwd        pe_encode fwd+bwd
  encode_bwd    full packed encode fwd+bwd (sum of parts check)
  apply_bwd     encode + MLPs fwd+bwd
  full / full_bf16 / full_S64   whole rgb steps

Writes /tmp/probe17.json.
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

R, S = 4096, 128
BKT_B = ((0.5, 4), (0.25, 8), (0.25, 16))
NPTS = int(R * (0.5 * 4 + 0.25 * 8 + 0.25 * 16))  # 32768


def chained_ms(fn, reps=25):
    c = fn(jnp.float32(0))
    float(c)
    t0 = time.perf_counter()
    c = jnp.float32(0)
    for _ in range(reps):
        c = fn(c)
    float(c)
    return (time.perf_counter() - t0) / reps * 1000


def make_rays(rng, n):
    o = rng.normal(size=(n, 3))
    o = 0.5 + 1.5 * o / np.linalg.norm(o, axis=-1, keepdims=True)
    d = np.asarray([0.5, 0.5, 0.5]) - o + 0.1 * rng.normal(size=o.shape)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


def main():
    from instance_nerf_tpu.models.fast_encode import (
        brick_encode, brick_resolutions, dense_trilinear, pe_encode,
    )
    from instance_nerf_tpu.models.render import (
        OccupancyGrid, _compact_inputs, coarse_occupancy_mxu, ray_aabb,
        sample_points,
    )
    from instance_nerf_tpu.train.ngp_trainer import (
        InstanceFieldTrainer, fast_ngp_config,
    )

    T = 2 ** 15
    base = dict(n_rays=R, n_samples=S, k_occupied=16, occ_coarse_res=32,
                table_size=T, n_levels=3, n_features=4, k_buckets=BKT_B)
    cfg = fast_ngp_config(**base)
    tr = InstanceFieldTrainer(cfg)
    model, params = tr.model, tr.params

    rng = np.random.default_rng(0)
    o, d = make_rays(rng, R)
    rgb_t = jnp.asarray(rng.uniform(size=(R, 3)), jnp.float32)
    inst_t = jnp.asarray(rng.integers(0, cfg.num_instances, R), jnp.int32)
    g = cfg.occ_res
    occ_grid = jnp.where(
        jnp.asarray(rng.uniform(size=(g, g, g)) < 0.25), 1e3, 0.0)
    occ = OccupancyGrid(grid=occ_grid, threshold=0.01)
    xyz = jnp.asarray(rng.uniform(0.05, 0.95, (NPTS, 3)), jnp.float32)
    vd = jnp.asarray(rng.normal(size=(NPTS, 3)), jnp.float32)
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
    resolutions = brick_resolutions(3, cfg.base_res, cfg.max_res)
    table = params["params"]["brick_table"]
    dense_grid = params["params"]["dense_grid"]

    @jax.jit
    def trivial(c):
        return c + 1.0 - 1.0

    overhead = chained_ms(trivial, reps=50)
    out = {"overhead_ms": round(overhead, 3), "R": R, "S": S,
           "npts": NPTS, "T": T}

    def rec(name, fn):
        try:
            ms = chained_ms(fn) - overhead
            out[name] = round(ms, 3)
        except Exception as e:  # noqa: BLE001
            out[name] = f"ERR {type(e).__name__}: {str(e)[:150]}"
        print(name, out[name], flush=True)
        with open("/tmp/probe17.json", "w") as f:
            json.dump(out, f, indent=2)

    # -- prefix: everything before the field query ----------------------
    @jax.jit
    def prefix(c):
        key = jax.random.key(0)
        near, far = ray_aabb(o + c * 0, d)
        valid = far > near
        far2 = jnp.maximum(far, near + 1e-4)
        xyz_s, t, dt = sample_points(key, o, d, S, near, far2, True)
        xyz_c = jnp.clip(xyz_s, 0.0, 1.0)
        occ_all = coarse_occupancy_mxu(occ, xyz_c, 32)
        hits = jnp.where(valid, occ_all.sum(axis=-1), -1.0)
        order = jnp.argsort(hits)
        acc = jnp.float32(0)
        start = 0
        for frac, k in ((0.5, 4), (0.25, 8), (0.25, 16)):
            n = int(R * frac)
            sel = jax.lax.dynamic_slice_in_dim(order, start, n)
            start += n
            xk, vk, tk, dtk, kf = _compact_inputs(
                o[sel], d[sel], t[sel], dt[sel], occ_all[sel], occ, k, True)
            acc = acc + jnp.sum(xk) * 0 + jnp.sum(kf) * 0
        return c + acc + 1

    rec("prefix", prefix)

    # -- encode parts at precompacted points -----------------------------
    @jax.jit
    def dense_fwd(c):
        h = dense_trilinear(dense_grid, xyz + c * 0)
        return c + jnp.sum(h) * 0 + 1

    rec("dense_fwd", dense_fwd)

    @jax.jit
    def dense_bwd(c):
        def loss(gr):
            return jnp.sum(dense_trilinear(gr, xyz + c * 0))

        l, g_ = jax.value_and_grad(loss)(dense_grid)
        return c + l * 0 + jnp.sum(g_) * 0 + 1

    rec("dense_bwd", dense_bwd)

    @jax.jit
    def dense_bwd_c32k(c):
        def loss(gr):
            return jnp.sum(dense_trilinear(gr, xyz + c * 0, chunk=NPTS))

        l, g_ = jax.value_and_grad(loss)(dense_grid)
        return c + l * 0 + jnp.sum(g_) * 0 + 1

    rec("dense_bwd_c32k", dense_bwd_c32k)

    @jax.jit
    def brick_fwd(c):
        h = brick_encode(table, xyz + c * 0, resolutions)
        return c + jnp.sum(h) * 0 + 1

    rec("brick_fwd", brick_fwd)

    @jax.jit
    def brick_bwd(c):
        def loss(tb):
            return jnp.sum(brick_encode(tb, xyz + c * 0, resolutions))

        l, g_ = jax.value_and_grad(loss)(table)
        return c + l * 0 + jnp.sum(g_) * 0 + 1

    rec("brick_bwd", brick_bwd)

    @jax.jit
    def brick_bwd_bf16(c):
        def loss(tb):
            return jnp.sum(brick_encode(tb, xyz + c * 0, resolutions,
                                        table_cast=jnp.bfloat16))

        l, g_ = jax.value_and_grad(loss)(table)
        return c + l * 0 + jnp.sum(g_) * 0 + 1

    rec("brick_bwd_bf16", brick_bwd_bf16)

    @jax.jit
    def pe_bwd(c):
        def loss(x_):
            return jnp.sum(pe_encode(x_))

        l, g_ = jax.value_and_grad(loss)(xyz + c * 0)
        return c + l * 0 + jnp.sum(g_) * 0 + 1

    rec("pe_bwd", pe_bwd)

    @jax.jit
    def encode_bwd(c):
        def loss(p):
            return jnp.sum(model.apply(p, xyz + c * 0, method="encode"))

        l, grads = jax.value_and_grad(loss)(params)
        return c + l * 0 + sum(
            jnp.sum(x) * 0 for x in jax.tree_util.tree_leaves(grads)) + 1

    rec("encode_bwd", encode_bwd)

    @jax.jit
    def apply_bwd(c):
        def loss(p):
            s_, rgb_, lg_ = model.apply(p, xyz + c * 0, vd)
            return jnp.sum(s_ ** 2) * 1e-6 + jnp.sum(rgb_)

        l, grads = jax.value_and_grad(loss)(params)
        return c + l * 0 + sum(
            jnp.sum(x) * 0 for x in jax.tree_util.tree_leaves(grads)) + 1

    rec("apply_bwd", apply_bwd)

    # -- full steps -------------------------------------------------------
    def full(tr_, o_, d_, rgb_, inst_, stage):
        step_fn = tr_._step_fn(stage)

        def f(c, params=tr_.params, opt_state=tr_.opt_state):
            p2, o2, losses = step_fn(params, opt_state, occ_grid,
                                     jax.random.key(0), o_ + c * 0, d_,
                                     rgb_, inst_)
            return c + losses["rgb"] * 0 + 1

        return f

    rec("full", full(tr, o, d, rgb_t, inst_t, "rgb"))
    rec("full_inst", full(tr, o, d, rgb_t, inst_t, "instance"))

    tr_bf16 = InstanceFieldTrainer(
        fast_ngp_config(**{**base, "table_dtype": "bfloat16"}))
    rec("full_bf16", full(tr_bf16, o, d, rgb_t, inst_t, "rgb"))
    rec("full_bf16_inst", full(tr_bf16, o, d, rgb_t, inst_t, "instance"))

    tr_s64 = InstanceFieldTrainer(fast_ngp_config(**{**base,
                                                     "n_samples": 64}))
    rec("full_S64", full(tr_s64, o, d, rgb_t, inst_t, "rgb"))

    for k in ("full", "full_bf16", "full_S64"):
        if isinstance(out.get(k), float):
            out[f"{k}_rays_s"] = round(R / out[k] * 1000)
    print(json.dumps(out))
    with open("/tmp/probe17.json", "w") as f:
        json.dump(out, f, indent=2)
    print("PROBE17 OK")


if __name__ == "__main__":
    main()
