"""probe12: breaking the scatter RMW chain + row-packing configs.

probe9/probe10 found: (a) XLA scatter-add collapses with table footprint
(79.9 M rows/s at T=2^15 vs 17M at 2^17); (b) the Pallas kernel's
per-update cost is width-independent up to W=32 (wide rows ~2x bytes at
the same op rate); (c) the loop2d kernel is bound at ~60 M rows/s by the
serial dynamic-sublane read-modify-write chain.

Two levers measured here at T=2^15 (N=131072 updates = one brick level's
backward at 4096 rays K=32):

1. REPLICA ACCUMULATORS — K disjoint VMEM copies of the table,
   update i -> copy i%K, reduced at the end: K independent RMW chains
   the scheduler can interleave. (kernels/scatter_pallas.py replicas=K)
2. ROW PACKING — n_features 4 instead of 2 halves the scattered row
   count per feature byte (W=32 rows), so an L-level encode with the
   same total feature dim scatters half the rows.

Micro variants + end-to-end rgb-stage steps for the packed configs.
Correctness of every Pallas variant is asserted vs XLA on-chip.
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

from instance_nerf_tpu.kernels.scatter_pallas import (  # noqa: E402
    ROWS, TILE, scatter_add_pallas,
)

SMOKE = bool(int(os.environ.get("PROBE12_CPU_SMOKE", "0")))
if SMOKE:  # CPU correctness/shape pass before burning TPU queue time
    jax.config.update("jax_platforms", "cpu")
N, T = 131072, 2 ** 15
R, S = (256, 32) if SMOKE else (4096, 128)


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

    @jax.jit
    def trivial(c):
        return c + 1.0 - 1.0

    overhead = chained_ms(trivial, (), reps=50)
    out = {"overhead_ms": round(overhead, 3), "n": N, "t": T}

    def micro(name, w, n, replicas):
        idx = jnp.asarray(rng.integers(0, T, n), jnp.int32)
        upd = jnp.asarray(rng.normal(size=(n, w)).astype(np.float32))
        want = jnp.zeros((T, w)).at[idx].add(upd)
        try:
            got = scatter_add_pallas(idx, upd, T, replicas=replicas)
            err = float(jnp.max(jnp.abs(got - want)))
            assert err < 1e-3, f"mismatch {err}"

            @jax.jit
            def one(c, idx, upd):
                res = scatter_add_pallas(
                    idx, upd + c * 0, T, replicas=replicas)
                return c + res[0, 0] * 0 + 1

            ms = chained_ms(one, (idx, upd)) - overhead
            out[name] = {"ms": round(ms, 3),
                         "mrows_s": round(n / ms / 1e3, 1)}
        except Exception as e:  # noqa: BLE001
            out[name] = f"ERR {type(e).__name__}: {str(e)[:150]}"
        print(name, out[name], flush=True)

    if SMOKE:
        out["micro"] = "skipped (smoke)"
    else:
        _run_micros(micro)

    run_steps(out, rng, overhead)

    print(json.dumps(out))
    with open("/tmp/probe12.json", "w") as f:
        json.dump(out, f)


def _run_micros(micro):
    micro("pallas_rep1_w16", 16, N, 1)
    micro("pallas_rep2_w16", 16, N, 2)
    micro("pallas_rep4_w16", 16, N, 4)
    micro("pallas_rep8_w16", 16, N, 8)
    micro("pallas_rep1_w32", 32, N // 2, 1)
    micro("pallas_rep2_w32", 32, N // 2, 2)
    micro("pallas_rep4_w32", 32, N // 2, 4)


def run_steps(out, rng, overhead):
    # XLA W=32 at T=2^15 (probe10 covers W=16 across T)
    idx = jnp.asarray(rng.integers(0, T, N // 2), jnp.int32)
    upd = jnp.asarray(rng.normal(size=(N // 2, 32)).astype(np.float32))

    @jax.jit
    def xla32(c, idx, upd):
        res = jnp.zeros((T, 32)).at[idx].add(upd + c * 0)
        return c + jnp.sum(res) * 0 + 1

    ms = chained_ms(xla32, (idx, upd)) - overhead
    out["xla_w32_T15"] = {"ms": round(ms, 3),
                          "mrows_s": round(N / 2 / ms / 1e3, 1)}
    print("xla_w32_T15", out["xla_w32_T15"], flush=True)

    # ---- end-to-end rgb-stage steps (the table-updating stage) ----
    from instance_nerf_tpu.train.ngp_trainer import (
        InstanceFieldTrainer,
        fast_ngp_config,
    )

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

    def step_time(name, cfg):
        try:
            tr = InstanceFieldTrainer(cfg)
            inst_t = jnp.zeros((R,), jnp.int32)
            step_fn = tr._step_fn("rgb")

            def one(c, params=tr.params, opt_state=tr.opt_state):
                p2, o2, losses = step_fn(params, opt_state, occ_grid,
                                         jax.random.key(0), o + c * 0, d,
                                         rgb_t, inst_t)
                return c + losses["rgb"] * 0 + 1

            ms = chained_ms(lambda c: one(c), (), reps=20) - overhead
            out[name] = {"ms": round(ms, 3),
                         "rays_s": round(R / ms * 1000)}
        except Exception as e:  # noqa: BLE001
            out[name] = f"ERR {type(e).__name__}: {str(e)[:150]}"
        print(name, out[name], flush=True)

    base = dict(n_rays=R, n_samples=S, occ_coarse_res=32, k_occupied=32)
    step_time("rgb_pallas_T15",
              fast_ngp_config(table_size=T, pallas_grad=True, **base))
    step_time("rgb_rep4_T15",
              fast_ngp_config(table_size=T, pallas_grad=True,
                              pallas_replicas=4, **base))
    step_time("rgb_xla_L3F4_T15",
              fast_ngp_config(table_size=T, n_levels=3, n_features=4,
                              **base))
    step_time("rgb_rep4_L3F4_T15",
              fast_ngp_config(table_size=T, n_levels=3, n_features=4,
                              pallas_grad=True, pallas_replicas=4, **base))
    step_time("rgb_rep4_L4F4_T15",
              fast_ngp_config(table_size=T, n_levels=4, n_features=4,
                              pallas_grad=True, pallas_replicas=4, **base))


if __name__ == "__main__":
    main()
