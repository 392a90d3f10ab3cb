"""probe13: rgb-step config matrix after probe10's discovery that XLA
scatter at in-step scale is collision-ratio-bound (138M rows/s at
T=2^15, N=131k) and the T=2^15 XLA step runs 24.5 ms (167k rays/s).

Candidates for the shipping fast_ngp_config, all XLA-grad unless noted:

  T15_K32       - probe10's winner re-measured (baseline for this file)
  T15_K16       - half the compacted samples
  T16_K32       - lower collision ratio, bigger table
  T15_K32_S96   - 96 dense candidates (the quality driver's setting)
  T15_K32_d32   - dense 32^3 MXU base + 5 brick levels (zero-scatter L0)
  T15_K32_pal   - Pallas VJP retry (probe10 hit a transient compile 500)
  T15_K16_d32   - the likely shipping combo

Chained-dependency timing, overhead-subtracted; /tmp/probe13.json.
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

R = 4096


def chained_ms(fn, reps=20):
    c = fn(jnp.float32(0))
    float(c)
    t0 = time.perf_counter()
    c = jnp.float32(0)
    for _ in range(reps):
        c = fn(c)
    float(c)
    return (time.perf_counter() - t0) / reps * 1000


def main():
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
    rgb_t = jnp.asarray(rng.uniform(size=(R, 3)), jnp.float32)
    g = 128
    occ_grid = jnp.where(
        jnp.asarray(rng.uniform(size=(g, g, g)) < 0.25), 1e3, 0.0)

    @jax.jit
    def trivial(c):
        return c + 1.0 - 1.0

    overhead = chained_ms(trivial, reps=50)
    out = {"overhead_ms": round(overhead, 3)}

    def step_time(name, cfg, stage="rgb"):
        try:
            tr = InstanceFieldTrainer(cfg)
            inst_t = jnp.zeros((R,), jnp.int32)
            step_fn = tr._step_fn(stage)

            def one(c, params=tr.params, opt_state=tr.opt_state):
                p2, o2, losses = step_fn(params, opt_state, occ_grid,
                                         jax.random.key(0), o + c * 0, d,
                                         rgb_t, inst_t)
                return c + losses["rgb"] * 0 + 1

            ms = chained_ms(lambda c: one(c)) - overhead
            out[name] = {"ms": round(ms, 3), "rays_s": round(R / ms * 1000)}
        except Exception as e:  # noqa: BLE001
            out[name] = f"ERR {type(e).__name__}: {str(e)[:150]}"
        print(name, out[name], flush=True)

    base = dict(n_rays=R, occ_coarse_res=32)
    T = 2 ** 15
    step_time("T15_K32", fast_ngp_config(table_size=T, k_occupied=32,
                                         n_samples=128, **base))
    step_time("T15_K16", fast_ngp_config(table_size=T, k_occupied=16,
                                         n_samples=128, **base))
    step_time("T16_K32", fast_ngp_config(table_size=2 ** 16, k_occupied=32,
                                         n_samples=128, **base))
    step_time("T15_K32_S96", fast_ngp_config(table_size=T, k_occupied=32,
                                             n_samples=96, **base))
    step_time("T15_K32_d32", fast_ngp_config(table_size=T, k_occupied=32,
                                             n_samples=128, dense_res=32,
                                             base_res=64, n_levels=5, **base))
    step_time("T15_K32_pal", fast_ngp_config(table_size=T, k_occupied=32,
                                             n_samples=128, pallas_grad=True,
                                             **base))
    step_time("T15_K16_d32", fast_ngp_config(table_size=T, k_occupied=16,
                                             n_samples=128, dense_res=32,
                                             base_res=64, n_levels=5, **base))
    # the instance stage at the winning table size (sanity: ~unchanged)
    step_time("inst_T15_K32", fast_ngp_config(table_size=T, k_occupied=32,
                                              n_samples=128, **base),
              stage="instance")

    print(json.dumps(out))
    with open("/tmp/probe13.json", "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
