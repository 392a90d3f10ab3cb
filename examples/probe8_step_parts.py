"""probe8: decompose the instance-field train step AFTER the prefix
redesign (render.py value-topk + optional coarse-MXU occupancy).

Parts measured on the real TPU at 4096 rays, K=32 compacted samples
(131k points), fast encoding (6 brick levels + dense base + PE):

  apply_fwd       - model fwd at (R, K) points (encode + 3 MLP heads)
  apply_fwd_bwd   - value_and_grad of a scalar loss of the same fwd
  encode_fwd      - encode() alone (dense + brick + pe)
  encode_fwd_bwd  - encode + grad wrt table/dense grid
  mlp_fwd_bwd     - heads alone on a precomputed (R*K, feat) input
  composite_loss  - compositing + rgb/instance losses from precomputed
                    per-point outputs
  adam            - optimizer update alone on the param tree
  full_step       - whole train step (reference point)
  full_step_c32   - whole step with occ_coarse_res=32

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

R, S, K = 4096, 128, 32


def chained_ms(fn, args, reps=30):
    c = fn(jnp.float32(0), *args)
    jax.tree.map(lambda x: None, c)
    float(c)
    t0 = time.perf_counter()
    c = jnp.float32(0)
    for _ in range(reps):
        c = fn(c, *args)
    float(c)
    return (time.perf_counter() - t0) / reps * 1000


def main():
    import optax

    from instance_nerf_tpu.models.render import OccupancyGrid
    from instance_nerf_tpu.train.ngp_trainer import (
        InstanceFieldTrainer,
        fast_ngp_config,
    )

    cfg = fast_ngp_config(n_rays=R, n_samples=S, k_occupied=K)
    tr = InstanceFieldTrainer(cfg)
    model = tr.model
    params = tr.params
    opt_state = tr.opt_state
    rng = np.random.default_rng(0)
    o = rng.normal(size=(R, 3))
    o = 0.5 + 1.5 * o / np.linalg.norm(o, axis=-1, keepdims=True)
    d = np.asarray([0.5, 0.5, 0.5]) - o + 0.1 * rng.normal(size=o.shape)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    rgb_t = jnp.asarray(rng.uniform(size=(R, 3)), jnp.float32)
    inst_t = jnp.asarray(rng.integers(0, cfg.num_instances, R), jnp.int32)
    xyz = jnp.asarray(rng.uniform(0.05, 0.95, (R, K, 3)), jnp.float32)
    vd = jnp.broadcast_to(d[:, None, :], xyz.shape)
    g = cfg.occ_res
    occ_grid = jnp.where(
        jnp.asarray(rng.uniform(size=(g, g, g)) < 0.25), 1e3, 0.0)

    @jax.jit
    def trivial(c):
        return c + 1.0 - 1.0

    overhead = chained_ms(trivial, (), reps=50)

    @jax.jit
    def apply_fwd(c, params, xyz, vd):
        s_, rgb_, lg_ = model.apply(params, xyz + c * 0, vd)
        return c + (jnp.sum(s_) + jnp.sum(rgb_) + jnp.sum(lg_)) * 0 + 1

    @jax.jit
    def apply_fwd_bwd(c, params, xyz, vd):
        def loss(p):
            s_, rgb_, lg_ = model.apply(p, xyz + c * 0, vd)
            return jnp.sum(s_ ** 2) * 1e-6 + jnp.sum(rgb_) + jnp.sum(lg_ ** 2) * 1e-6

        l, grads = jax.value_and_grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(grads)
        return c + l * 0 + sum(jnp.sum(x) * 0 for x in leaves) + 1

    @jax.jit
    def encode_fwd(c, params, xyz):
        h = model.apply(params, xyz + c * 0, method="encode")
        return c + jnp.sum(h) * 0 + 1

    @jax.jit
    def encode_fwd_bwd(c, params, xyz):
        def loss(p):
            return jnp.sum(model.apply(p, xyz + c * 0, method="encode"))

        l, grads = jax.value_and_grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(grads)
        return c + l * 0 + sum(jnp.sum(x) * 0 for x in leaves) + 1

    # MLP heads alone: run on precomputed encode features by stubbing
    # encode cost out of the grad path
    feat_dim = model.apply(params, xyz[:1, :1], method="encode").shape[-1]
    feats = jnp.asarray(rng.normal(size=(R, K, feat_dim)) * 0.1, jnp.float32)

    @jax.jit
    def mlp_fwd_bwd(c, params, feats, vd):
        def loss(p):
            def heads(m, h):
                h1 = jax.nn.relu(m.sigma_mlp[0](h))
                h1 = m.sigma_mlp[1](h1)
                sigma_raw, geo = h1[..., 0], h1[..., 1:]
                rgb_ = m.color(geo, vd)
                lg_ = m.instance(geo)
                return sigma_raw, rgb_, lg_

            s_, rgb_, lg_ = model.apply(p, feats + c * 0, method=heads)
            return jnp.sum(s_ ** 2) * 1e-6 + jnp.sum(rgb_) + jnp.sum(lg_ ** 2) * 1e-6

        l, grads = jax.value_and_grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(grads)
        return c + l * 0 + sum(jnp.sum(x) * 0 for x in leaves) + 1

    from instance_nerf_tpu.models.render import composite

    @jax.jit
    def composite_loss(c, sr, rgbp, lg, t, dt):
        out = composite(sr + c * 0, rgbp, lg, t, dt)
        rgb_loss = jnp.mean((out.rgb - rgb_t) ** 2)
        logp = jax.nn.log_softmax(out.instance_logits, axis=-1)
        ce = -jnp.take_along_axis(logp, inst_t[:, None], axis=-1)[:, 0]
        return c + (rgb_loss + jnp.mean(ce)) * 0 + 1

    sr = jnp.asarray(rng.normal(size=(R, K)), jnp.float32)
    rgbp = jnp.asarray(rng.uniform(size=(R, K, 3)), jnp.float32)
    lg = jnp.asarray(rng.normal(size=(R, K, cfg.num_instances)), jnp.float32)
    t_s = jnp.asarray(np.sort(rng.uniform(0, 2, (R, K)), axis=1), jnp.float32)
    dt_s = jnp.full((R, K), 0.01, jnp.float32)

    tx = tr.tx
    grads0 = jax.tree.map(lambda x: x * 0 + 1e-6, params)

    @jax.jit
    def adam(c, params, opt_state):
        upd, new_opt = tx.update(
            jax.tree.map(lambda x: x + c * 0, grads0), opt_state, params)
        new_p = jax.tree_util.tree_leaves(
            jax.tree.map(lambda a, b: a + b, params, upd))
        return c + sum(jnp.sum(x) * 0 for x in new_p) + 1

    step_fn = tr._step_fn("instance")

    def full(c, params, opt_state):
        p2, o2, losses = step_fn(params, opt_state, occ_grid,
                                 jax.random.key(0), o + c * 0, d, rgb_t,
                                 inst_t)
        return c + losses["rgb"] * 0 + 1

    cfg2 = fast_ngp_config(n_rays=R, n_samples=S, k_occupied=K,
                           occ_coarse_res=32)
    tr2 = InstanceFieldTrainer(cfg2)
    tr2.params, tr2.opt_state = params, opt_state
    step_fn2 = tr2._step_fn("instance")

    def full_c32(c, params, opt_state):
        p2, o2, losses = step_fn2(params, opt_state, occ_grid,
                                  jax.random.key(0), o + c * 0, d, rgb_t,
                                  inst_t)
        return c + losses["rgb"] * 0 + 1

    out = {"overhead_ms": round(overhead, 3)}
    for name, fn, args in (
        ("apply_fwd", apply_fwd, (params, xyz, vd)),
        ("apply_fwd_bwd", apply_fwd_bwd, (params, xyz, vd)),
        ("encode_fwd", encode_fwd, (params, xyz)),
        ("encode_fwd_bwd", encode_fwd_bwd, (params, xyz)),
        ("mlp_fwd_bwd", mlp_fwd_bwd, (params, feats, vd)),
        ("composite_loss", composite_loss, (sr, rgbp, lg, t_s, dt_s)),
        ("adam", adam, (params, opt_state)),
        ("full_step", full, (params, opt_state)),
        ("full_step_c32", full_c32, (params, opt_state)),
    ):
        try:
            ms = chained_ms(fn, args) - overhead
            out[name] = round(ms, 3)
        except Exception as e:  # noqa: BLE001
            out[name] = f"ERR {type(e).__name__}: {str(e)[:150]}"
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
