"""probe10: scatter rate vs TABLE SIZE (probe9 found XLA scatter-add at
T=2^15 runs 80M rows/s vs the known 17M at T=2^17 — the rate collapses
with table footprint, so shrinking tables may beat any kernel).

Measures, at N=131072 updates x W=16 f32 (one brick level's backward
per step at 4096 rays K=32):

  xla_T{14..18}     - XLA .at[].add into a (2^T, 16) zero table
  pallas_T{15,17}   - the (loop2d) Pallas kernel at the same sizes
  rgb step @ table_size=2^15 XLA (end-to-end, 6 levels)

Also quality levers: the parity driver (fast_quality_multi) covers
quality at 2^15 separately.
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

N, W = 131072, 16


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
    from instance_nerf_tpu.kernels.scatter_pallas import scatter_add_pallas
    from instance_nerf_tpu.train.ngp_trainer import (
        InstanceFieldTrainer,
        fast_ngp_config,
    )

    rng = np.random.default_rng(0)
    upd = jnp.asarray(rng.normal(size=(N, W)).astype(np.float32))

    @jax.jit
    def trivial(c):
        return c + 1.0 - 1.0

    overhead = chained_ms(trivial, (), reps=50)
    out = {"overhead_ms": round(overhead, 3), "n": N, "w": W}

    for logt in (14, 15, 16, 17, 18):
        t = 2 ** logt
        idx = jnp.asarray(rng.integers(0, t, N), jnp.int32)

        def xla(c, idx, upd, t=t):
            res = jnp.zeros((t, W)).at[idx].add(upd + c * 0)
            return c + jnp.sum(res) * 0 + 1

        xla_j = jax.jit(xla)
        try:
            ms = chained_ms(xla_j, (idx, upd)) - overhead
            out[f"xla_T{logt}"] = {"ms": round(ms, 3),
                                   "mrows_s": round(N / ms / 1e3, 1)}
        except Exception as e:  # noqa: BLE001
            out[f"xla_T{logt}"] = f"ERR {str(e)[:120]}"
        print(f"xla_T{logt}", out[f"xla_T{logt}"], flush=True)

    for logt in (15, 17):
        t = 2 ** logt
        idx = jnp.asarray(rng.integers(0, t, N), jnp.int32)

        def pal(c, idx, upd, t=t):
            res = scatter_add_pallas(
                (idx + (c * 0).astype(jnp.int32)), upd, t)
            return c + jnp.sum(res) * 0 + 1

        pal_j = jax.jit(pal)
        try:
            ms = chained_ms(pal_j, (idx, upd)) - overhead
            out[f"pallas_T{logt}"] = {"ms": round(ms, 3),
                                      "mrows_s": round(N / ms / 1e3, 1)}
        except Exception as e:  # noqa: BLE001
            out[f"pallas_T{logt}"] = f"ERR {str(e)[:120]}"
        print(f"pallas_T{logt}", out[f"pallas_T{logt}"], flush=True)

    # end-to-end rgb step at table_size=2^15, XLA grads
    R, S = 4096, 128
    o = rng.normal(size=(R, 3))
    o = 0.5 + 1.5 * o / np.linalg.norm(o, axis=-1, keepdims=True)
    d = np.asarray([0.5, 0.5, 0.5]) - o + 0.1 * rng.normal(size=o.shape)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    oj, dj = jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)
    rgb_t = jnp.asarray(rng.uniform(size=(R, 3)), jnp.float32)
    inst_t = jnp.zeros((R,), jnp.int32)
    g = 128
    occ_grid = jnp.where(
        jnp.asarray(rng.uniform(size=(g, g, g)) < 0.25), 1e3, 0.0)

    for name, kw in (
        ("rgbstep_T15_xla", dict(table_size=2 ** 15)),
        ("rgbstep_T15_pallas", dict(table_size=2 ** 15, pallas_grad=True)),
    ):
        try:
            tr = InstanceFieldTrainer(fast_ngp_config(
                n_rays=R, n_samples=S, k_occupied=32, occ_coarse_res=32,
                **kw))
            step_fn = tr._step_fn("rgb")

            def one(c, params=tr.params, opt_state=tr.opt_state):
                _, _, losses = step_fn(params, opt_state, occ_grid,
                                       jax.random.key(0), oj + c * 0, dj,
                                       rgb_t, inst_t)
                return c + losses["rgb"] * 0 + 1

            ms = chained_ms(lambda c: one(c), (), reps=20) - overhead
            out[name] = {"ms": round(ms, 3),
                         "rays_s": round(R / ms * 1000)}
        except Exception as e:  # noqa: BLE001
            out[name] = f"ERR {type(e).__name__}: {str(e)[:150]}"
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
