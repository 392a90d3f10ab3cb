"""probe8c: RGB-STAGE train-step A/B — the stage that actually updates
the hash/brick tables (the instance stage stop-gradients the field, so
its 12-13 ms steps never pay the table backward; probe8b found the
brick fwd+bwd at 54.6 ms XLA / 31.2 ms Pallas-VJP).

Measures full rgb-stage steps (fwd + FULL bwd incl. table scatter +
adam) at 4096 rays:

  rgb_xla_K32       - current default (XLA .at[].add table grads)
  rgb_pallas_K32    - pallas_grad=True
  rgb_pallas_K16    - + K=16 compaction
  rgb_pallas_dense32- + dense MXU base at 32^3 replacing brick level 0
                      (base_res 64, n_levels 5 — zero-scatter coarse)
  inst_pallas_K32   - instance stage with pallas flag (sanity: should
                      match the ~12 ms baseline; table grads are zero)

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

R, S = 4096, 128


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

    def step_time(name, cfg, stage):
        try:
            tr = InstanceFieldTrainer(cfg)
            inst_t = jnp.zeros((R,), jnp.int32)
            step_fn = tr._step_fn(stage)

            def one(c, params=tr.params, opt_state=tr.opt_state):
                p2, o2, losses = step_fn(params, opt_state, occ_grid,
                                         jax.random.key(0), o + c * 0, d,
                                         rgb_t, inst_t)
                return c + losses["rgb"] * 0 + 1

            out[name] = round(chained_ms(lambda c: one(c)) - overhead, 3)
        except Exception as e:  # noqa: BLE001
            out[name] = f"ERR {type(e).__name__}: {str(e)[:150]}"
        print(name, out[name], flush=True)

    base = dict(n_rays=R, n_samples=S, occ_coarse_res=32)
    step_time("rgb_xla_K32", fast_ngp_config(k_occupied=32, **base), "rgb")
    step_time("rgb_pallas_K32",
              fast_ngp_config(k_occupied=32, pallas_grad=True, **base),
              "rgb")
    step_time("rgb_pallas_K16",
              fast_ngp_config(k_occupied=16, pallas_grad=True, **base),
              "rgb")
    step_time("rgb_pallas_dense32",
              fast_ngp_config(k_occupied=32, pallas_grad=True,
                              dense_res=32, base_res=64, n_levels=5,
                              **base),
              "rgb")
    step_time("inst_pallas_K32",
              fast_ngp_config(k_occupied=32, pallas_grad=True, **base),
              "instance")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
