"""probe14: decompose the PACKED rgb step (T=2^15, 3 levels x 4
features — probe12's 18 ms / 227k rays/s winner) to find the next wall.

Parts at 4096 rays, S=128 dense candidates, K=32 compacted (131k pts):

  prefix        - render_rays ray prefix alone: sample_points +
                  coarse-MXU occupancy + value-top_k compaction
  encode_fwd    - packed encode() (dense base + 3 brick levels + PE)
  encode_bwd    - + grad wrt tables/dense grid
  apply_bwd     - full field fwd+bwd at precompacted points
  full_rgb      - whole rgb train step (reference point)
  full_rgb_R8k  - 8192 rays (is the step still per-point-bound?)
  full_rgb_K16  - K=16 compaction
  full_inst     - instance stage at the packed config

Chained-dependency timing, overhead-subtracted; /tmp/probe14.json.
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
    from instance_nerf_tpu.models.render import (
        OccupancyGrid, coarse_occupancy_mxu, ray_aabb, sample_points,
    )
    from instance_nerf_tpu.train.ngp_trainer import (
        InstanceFieldTrainer, fast_ngp_config,
    )

    T = 2 ** 15
    base = dict(n_rays=R, n_samples=S, k_occupied=K, occ_coarse_res=32,
                table_size=T, n_levels=3, n_features=4)
    cfg = fast_ngp_config(**base)
    tr = InstanceFieldTrainer(cfg)
    model, params, opt_state = tr.model, tr.params, tr.opt_state

    rng = np.random.default_rng(0)
    o, d = make_rays(rng, R)
    rgb_t = jnp.asarray(rng.uniform(size=(R, 3)), jnp.float32)
    inst_t = jnp.asarray(rng.integers(0, cfg.num_instances, R), jnp.int32)
    g = cfg.occ_res
    occ_grid = jnp.where(
        jnp.asarray(rng.uniform(size=(g, g, g)) < 0.25), 1e3, 0.0)
    xyz = jnp.asarray(rng.uniform(0.05, 0.95, (R, K, 3)), jnp.float32)
    vd = jnp.broadcast_to(d[:, None, :], xyz.shape)

    @jax.jit
    def trivial(c):
        return c + 1.0 - 1.0

    overhead = chained_ms(trivial, reps=50)
    out = {"overhead_ms": round(overhead, 3), "R": R, "S": S, "K": K,
           "T": T, "levels": 3, "features": 4}

    def rec(name, fn):
        try:
            ms = chained_ms(fn) - overhead
            out[name] = {"ms": round(ms, 3)}
        except Exception as e:  # noqa: BLE001
            out[name] = f"ERR {type(e).__name__}: {str(e)[:150]}"
        print(name, out[name], flush=True)

    # -- prefix alone: sample + coarse occupancy + value-top_k ----------
    occ = OccupancyGrid(grid=occ_grid, threshold=0.01)

    @jax.jit
    def prefix(c):
        key = jax.random.key(0)
        near, far = ray_aabb(o + c * 0, d)
        t, dt = sample_points(key, o, d, S, near, far)
        xyz_c = o[:, None, :] + t[..., None] * d[:, None, :]
        occ_c = coarse_occupancy_mxu(occ, xyz_c, 32)
        sort_key = jnp.where(occ_c > 0, 0, 1) * (S + 1) + jnp.arange(S)
        neg_vals, _ = jax.lax.top_k(-sort_key, K)
        return c + jnp.sum(neg_vals) * 0 + 1

    rec("prefix", prefix)

    # -- encode fwd / bwd at precompacted points ------------------------
    @jax.jit
    def encode_fwd(c):
        h = model.apply(params, xyz + c * 0, method="encode")
        return c + jnp.sum(h) * 0 + 1

    rec("encode_fwd", encode_fwd)

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
            return (jnp.sum(s_ ** 2) * 1e-6 + jnp.sum(rgb_)
                    + jnp.sum(lg_ ** 2) * 1e-6)

        l, grads = jax.value_and_grad(loss)(params)
        return c + l * 0 + sum(
            jnp.sum(x) * 0 for x in jax.tree_util.tree_leaves(grads)) + 1

    rec("apply_bwd", apply_bwd)

    # -- full steps -----------------------------------------------------
    def full(tr_, o_, d_, rgb_, inst_, stage):
        step_fn = tr_._step_fn(stage)

        def f(c, params=tr_.params, opt_state=tr_.opt_state):
            p2, o2, losses = step_fn(params, opt_state, occ_grid,
                                     jax.random.key(0), o_ + c * 0, d_,
                                     rgb_, inst_)
            return c + losses["rgb"] * 0 + 1

        return f

    rec("full_rgb", full(tr, o, d, rgb_t, inst_t, "rgb"))
    rec("full_inst", full(tr, o, d, rgb_t, inst_t, "instance"))

    o8, d8 = make_rays(rng, 2 * R)
    rgb8 = jnp.asarray(rng.uniform(size=(2 * R, 3)), jnp.float32)
    in8 = jnp.asarray(rng.integers(0, cfg.num_instances, 2 * R), jnp.int32)
    tr8 = InstanceFieldTrainer(fast_ngp_config(**{**base, "n_rays": 2 * R}))
    rec("full_rgb_R8k", full(tr8, o8, d8, rgb8, in8, "rgb"))

    tr16 = InstanceFieldTrainer(
        fast_ngp_config(**{**base, "k_occupied": 16}))
    rec("full_rgb_K16", full(tr16, o, d, rgb_t, inst_t, "rgb"))

    for k in ("full_rgb", "full_rgb_K16"):
        if isinstance(out.get(k), dict):
            out[k]["rays_s"] = round(R / out[k]["ms"] * 1000)
    if isinstance(out.get("full_rgb_R8k"), dict):
        out["full_rgb_R8k"]["rays_s"] = round(2 * R / out["full_rgb_R8k"]["ms"] * 1000)
    if isinstance(out.get("full_inst"), dict):
        out["full_inst"]["rays_s"] = round(R / out["full_inst"]["ms"] * 1000)

    print(json.dumps(out))
    with open("/tmp/probe14.json", "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
