"""probe17b: is the bucketed rgb step's cost COLLISION-dominated?

probe17 measured the same bktB step at 11.3 ms (occ grid 25% random)
that probe16's benchmark_train (occ fully occupied) measured at 5.6 ms,
and bf16 table reads took the 25%-occ step to 5.5 ms while saving only
12% on an isolated random-point brick backward. Hypothesis: XLA's
scatter-add serializes colliding rows; which rows collide depends on how
the compacted samples cluster in brick cells, which depends on the
OCCUPANCY PATTERN — so step time is data-dependent and the headline
numbers depend on the occupancy regime.

Grid: occupancy in {1.0, 0.5, 0.25, 0.1} x config in
{bktB, bktB_bf16, dense32_bktB, dense32_bktB_bf16} at R=4096 and the
two leaders at R=16384. All timings chained, overhead-subtracted,
identical rays. Writes /tmp/probe17b.json.
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

BKT_B = ((0.5, 4), (0.25, 8), (0.25, 16))


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
    from instance_nerf_tpu.train.ngp_trainer import (
        InstanceFieldTrainer, fast_ngp_config,
    )

    base = dict(n_samples=128, k_occupied=16, occ_coarse_res=32,
                table_size=2 ** 15, n_features=4, k_buckets=BKT_B)
    cfgs = {
        "bktB": dict(n_levels=3),
        "bktB_bf16": dict(n_levels=3, table_dtype="bfloat16"),
        "dense32_bktB": dict(n_levels=2, base_res=181, dense_res=32),
        "dense32_bktB_bf16": dict(n_levels=2, base_res=181, dense_res=32,
                                  table_dtype="bfloat16"),
    }
    rng = np.random.default_rng(0)
    out = {}

    @jax.jit
    def trivial(c):
        return c + 1.0 - 1.0

    overhead = chained_ms(trivial, reps=50)
    out["overhead_ms"] = round(overhead, 3)

    def run(name, cfg_kw, n_rays, occ_frac):
        tr = InstanceFieldTrainer(
            fast_ngp_config(n_rays=n_rays, **base, **cfg_kw))
        o, d = make_rays(rng, n_rays)
        rgb_t = jnp.asarray(rng.uniform(size=(n_rays, 3)), jnp.float32)
        inst_t = jnp.asarray(
            rng.integers(0, tr.cfg.num_instances, n_rays), jnp.int32)
        g = tr.cfg.occ_res
        if occ_frac >= 1.0:
            occ_grid = jnp.full((g, g, g), 1e3)
        else:
            occ_grid = jnp.where(
                jnp.asarray(rng.uniform(size=(g, g, g)) < occ_frac),
                1e3, 0.0)
        step_fn = tr._step_fn("rgb")

        def f(c, params=tr.params, opt_state=tr.opt_state):
            p2, o2, losses = step_fn(params, opt_state, occ_grid,
                                     jax.random.key(0), o + c * 0, d,
                                     rgb_t, inst_t)
            return c + losses["rgb"] * 0 + 1

        ms = chained_ms(f) - overhead
        key = f"{name}_R{n_rays}_occ{occ_frac}"
        out[key] = {"ms": round(ms, 2),
                    "rays_s": round(n_rays / ms * 1000)}
        print(key, out[key], flush=True)
        with open("/tmp/probe17b.json", "w") as fjs:
            json.dump(out, fjs, indent=2)

    for name, kw in cfgs.items():
        for frac in (1.0, 0.5, 0.25, 0.1):
            run(name, kw, 4096, frac)
    # leaders at R=16k, realistic occupancy
    for name in ("bktB_bf16", "dense32_bktB_bf16"):
        for frac in (1.0, 0.25):
            run(name, cfgs[name], 16384, frac)
    print("PROBE17B OK")


if __name__ == "__main__":
    main()
