"""probe8b: encode cost at RAY-COHERENT points (probe8 used uniform
points, which overstates gather/scatter by ~7x — locality matters).

Builds xyz exactly like the train step (ray sampling + value-topk
compaction), materializes it, then measures:

  encode_fwd / encode_fwd_bwd   - fast encoding at coherent (R, K) pts
  brick_fwd_bwd                 - brick levels alone
  dense_fwd_bwd                 - dense MXU base grid alone
  pe_fwd                        - positional encoding alone
  step_L{2,4,6}                 - full step at n_levels
  step_K16                      - full step at K=16
  step_pallas_vjp               - full step with pallas_grad=True (the
                                  scatter kernel as the table VJP) — the
                                  honest in-step A/B the VERDICT asks for

Chained-dependency timing, overhead-subtracted.
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

R, S, K = 4096, 128, 32


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
    from instance_nerf_tpu.models.fast_encode import (
        InstanceNGPFast,
        brick_encode,
        brick_resolutions,
        dense_trilinear,
        pe_encode,
    )
    from instance_nerf_tpu.models.render import (
        OccupancyGrid,
        ray_aabb,
        sample_points,
    )
    from instance_nerf_tpu.train.ngp_trainer import (
        InstanceFieldTrainer,
        fast_ngp_config,
    )

    rng = np.random.default_rng(0)
    o = rng.normal(size=(R, 3))
    o = 0.5 + 1.5 * o / np.linalg.norm(o, axis=-1, keepdims=True)
    d = np.asarray([0.5, 0.5, 0.5]) - o + 0.1 * rng.normal(size=o.shape)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    g = 128
    occ_np = rng.uniform(size=(g, g, g)) < 0.25
    occ_grid = jnp.where(jnp.asarray(occ_np), 1e3, 0.0)
    occ = OccupancyGrid(occ_grid, 0.01)

    # coherent compacted points, exactly the train step's prefix
    # (occ grid passed as an ARGUMENT — large captured constants are
    # rejected by the remote compiler, CLAUDE.md)
    @jax.jit
    def make_xyz(o, d, occ_grid):
        near, far = ray_aabb(o, d)
        far = jnp.maximum(far, near + 1e-4)
        xyz, t, dt = sample_points(jax.random.key(0), o, d, S, near, far, True)
        xyz_c = jnp.clip(xyz, 0.0, 1.0)
        occ_all = OccupancyGrid(occ_grid, 0.01).occupied(xyz_c)
        sk = jnp.where(occ_all > 0, 0, S) + jax.lax.broadcasted_iota(
            jnp.int32, occ_all.shape, 1)
        nv, _ = jax.lax.top_k(-sk, K)
        vals = -nv
        s_idx = jnp.where(vals < S, vals, vals - S)
        t_k = jnp.take_along_axis(t, s_idx, axis=1)
        return jnp.clip(o[:, None, :] + t_k[..., None] * d[:, None, :], 0, 1)

    xyz = jax.device_put(np.asarray(make_xyz(o, d, occ_grid)))  # materialize

    cfg = fast_ngp_config(n_rays=R, n_samples=S, k_occupied=K)
    tr = InstanceFieldTrainer(cfg)
    params = tr.params
    table = params["params"]["brick_table"]
    dense = params["params"]["dense_grid"]
    res = brick_resolutions(cfg.n_levels, cfg.base_res, cfg.max_res)

    @jax.jit
    def trivial(c):
        return c + 1.0 - 1.0

    overhead = chained_ms(trivial, (), reps=50)

    model = tr.model

    @jax.jit
    def encode_fwd(c, params, xyz):
        h = model.apply(params, xyz + c * 0, method="encode")
        return c + jnp.sum(h) * 0 + 1

    @jax.jit
    def encode_fwd_bwd(c, params, xyz):
        def loss(p):
            return jnp.sum(model.apply(p, xyz + c * 0, method="encode"))

        l, grads = jax.value_and_grad(loss)(params)
        return c + l * 0 + sum(
            jnp.sum(x) * 0 for x in jax.tree_util.tree_leaves(grads)) + 1

    @jax.jit
    def brick_fwd_bwd(c, table, xyz):
        def loss(tb):
            return jnp.sum(brick_encode(tb, xyz + c * 0, res))

        l, gr = jax.value_and_grad(loss)(table)
        return c + l * 0 + jnp.sum(gr) * 0 + 1

    @jax.jit
    def brick_fwd_bwd_pallas(c, table, xyz):
        def loss(tb):
            return jnp.sum(brick_encode(tb, xyz + c * 0, res,
                                        pallas_grad=True))

        l, gr = jax.value_and_grad(loss)(table)
        return c + l * 0 + jnp.sum(gr) * 0 + 1

    @jax.jit
    def dense_fwd_bwd(c, dense, xyz):
        def loss(dg):
            return jnp.sum(dense_trilinear(dg, xyz + c * 0))

        l, gr = jax.value_and_grad(loss)(dense)
        return c + l * 0 + jnp.sum(gr) * 0 + 1

    @jax.jit
    def pe_fwd(c, xyz):
        return c + jnp.sum(pe_encode(xyz + c * 0)) * 0 + 1

    out = {"overhead_ms": round(overhead, 3)}

    def run(name, fn, args):
        try:
            out[name] = round(chained_ms(fn, args) - overhead, 3)
        except Exception as e:  # noqa: BLE001
            out[name] = f"ERR {type(e).__name__}: {str(e)[:150]}"
        print(name, out[name], flush=True)

    run("encode_fwd", encode_fwd, (params, xyz))
    run("encode_fwd_bwd", encode_fwd_bwd, (params, xyz))
    run("brick_fwd_bwd", brick_fwd_bwd, (table, xyz))
    run("brick_fwd_bwd_pallas", brick_fwd_bwd_pallas, (table, xyz))
    run("dense_fwd_bwd", dense_fwd_bwd, (dense, xyz))
    run("pe_fwd", pe_fwd, (xyz,))

    # full-step scaling: levels / K / pallas VJP
    rgb_t = jnp.asarray(rng.uniform(size=(R, 3)), jnp.float32)
    inst_t = jnp.asarray(rng.integers(0, cfg.num_instances, R), jnp.int32)

    def step_time(cfg2):
        tr2 = InstanceFieldTrainer(cfg2)
        step_fn = tr2._step_fn("instance")

        def one(c, params, opt_state):
            p2, o2, losses = step_fn(params, opt_state, occ_grid,
                                     jax.random.key(0), o + c * 0, d,
                                     rgb_t, inst_t)
            return c + losses["rgb"] * 0 + 1

        return chained_ms(lambda c: one(c, tr2.params, tr2.opt_state),
                          (), reps=20) - overhead

    for name, cfg2 in (
        ("step_L2", fast_ngp_config(n_rays=R, n_samples=S, k_occupied=K,
                                    n_levels=2, occ_coarse_res=32)),
        ("step_L4", fast_ngp_config(n_rays=R, n_samples=S, k_occupied=K,
                                    n_levels=4, occ_coarse_res=32)),
        ("step_K16", fast_ngp_config(n_rays=R, n_samples=S, k_occupied=16,
                                     occ_coarse_res=32)),
        ("step_pallas_vjp", fast_ngp_config(n_rays=R, n_samples=S,
                                            k_occupied=K,
                                            occ_coarse_res=32)),
    ):
        try:
            if name == "step_pallas_vjp":
                import dataclasses

                tr2 = InstanceFieldTrainer(cfg2)
                from instance_nerf_tpu.models.fast_encode import (
                    InstanceNGPFast as M,
                )

                tr2.model = M(
                    n_levels=cfg2.n_levels, table_size=cfg2.table_size,
                    n_features=cfg2.n_features, base_res=cfg2.base_res,
                    max_res=cfg2.max_res, dense_res=cfg2.dense_res,
                    dense_features=cfg2.dense_features, hidden=cfg2.hidden,
                    num_instances=cfg2.num_instances,
                    dtype=jnp.bfloat16, pallas_grad=True,
                )
                tr2._step_fns = {}
                step_fn = tr2._step_fn("instance")

                def one(c, params=tr2.params, opt_state=tr2.opt_state):
                    p2, o2, losses = step_fn(params, opt_state, occ_grid,
                                             jax.random.key(0), o + c * 0,
                                             d, rgb_t, inst_t)
                    return c + losses["rgb"] * 0 + 1

                out[name] = round(chained_ms(lambda c: one(c), (), reps=20)
                                  - overhead, 3)
            else:
                out[name] = round(step_time(cfg2), 3)
        except Exception as e:  # noqa: BLE001
            out[name] = f"ERR {type(e).__name__}: {str(e)[:150]}"
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
