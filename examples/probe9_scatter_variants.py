"""probe9: scatter-add kernel micro-variants (the rgb-stage backward is
now the instance-field wall: 786k scattered rows/step at ~35M rows/s in
the current kernel, probe8b/8c).

Variants, all scattering 1M x W f32 rows into a (32k, W) VMEM table:

  base_w16      - current kernel (flat fori_loop, div/mod per iter)
  loop2d_w16    - nested fori (ROWS x TILE) — no div/mod in the body
  unroll2_w16   - 2 updates/iter with duplicate-merge (r1==r0)
  unroll4_w16   - 4 updates/iter with full first-equal merge
  base_w32_half - W=32 rows, N/2 updates (the F=4 x L/2 packing
                  candidate: same bytes, half the loop iterations)
  xla_w16       - XLA .at[].add reference

Correctness is asserted against XLA for every Pallas variant.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

TILE = 2048
ROWS = 8
N = ROWS * TILE * 8  # 131072 updates per measurement (in-step scale)
T = 2 ** 15


def _mk_call(kernel, n, w, t):
    return pl.pallas_call(
        kernel,
        grid=(n // (ROWS * TILE),),
        in_specs=[
            pl.BlockSpec((ROWS, TILE), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((ROWS * TILE, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, w), jnp.float32),
    )


def k_base(idx_ref, upd_ref, out_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def body(i, _):
        r = idx_ref[i // TILE, i % TILE]
        r = jnp.clip(r, 0, out_ref.shape[0] - 1)
        out_ref[pl.ds(r, 1), :] += upd_ref[pl.ds(i, 1), :]
        return 0

    jax.lax.fori_loop(0, ROWS * TILE, body, 0)


def k_loop2d(idx_ref, upd_ref, out_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def outer(j, _):
        def inner(k, _):
            r = jnp.clip(idx_ref[j, k], 0, out_ref.shape[0] - 1)
            out_ref[pl.ds(r, 1), :] += upd_ref[pl.ds(j * TILE + k, 1), :]
            return 0

        jax.lax.fori_loop(0, TILE, inner, 0)
        return 0

    jax.lax.fori_loop(0, ROWS, outer, 0)


def k_unroll2(idx_ref, upd_ref, out_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def body(i, _):
        b = 2 * i
        r0 = jnp.clip(idx_ref[b // TILE, b % TILE], 0, out_ref.shape[0] - 1)
        r1 = jnp.clip(idx_ref[(b + 1) // TILE, (b + 1) % TILE], 0,
                      out_ref.shape[0] - 1)
        u0 = upd_ref[pl.ds(b, 1), :]
        u1 = upd_ref[pl.ds(b + 1, 1), :]
        same = r1 == r0
        out_ref[pl.ds(r0, 1), :] += u0 + jnp.where(same, u1, 0.0)

        @pl.when(jnp.logical_not(same))
        def _():
            out_ref[pl.ds(r1, 1), :] += u1

        return 0

    jax.lax.fori_loop(0, ROWS * TILE // 2, body, 0)


def k_unroll4(idx_ref, upd_ref, out_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def body(i, _):
        b = 4 * i
        r = [jnp.clip(idx_ref[(b + j) // TILE, (b + j) % TILE], 0,
                      out_ref.shape[0] - 1) for j in range(4)]
        u = [upd_ref[pl.ds(b + j, 1), :] for j in range(4)]
        # attach each update to the FIRST equal index in the group
        e10 = r[1] == r[0]
        e20, e21 = r[2] == r[0], r[2] == r[1]
        e30, e31, e32 = r[3] == r[0], r[3] == r[1], r[3] == r[2]
        a0 = u[0] + jnp.where(e10, u[1], 0.0) + jnp.where(e20, u[2], 0.0) \
            + jnp.where(e30, u[3], 0.0)
        a1 = u[1] + jnp.where(e21 & ~e20, u[2], 0.0) \
            + jnp.where(e31 & ~e30, u[3], 0.0)
        a2 = u[2] + jnp.where(e32 & ~e30 & ~e31, u[3], 0.0)
        out_ref[pl.ds(r[0], 1), :] += a0

        @pl.when(jnp.logical_not(e10))
        def _():
            out_ref[pl.ds(r[1], 1), :] += a1

        @pl.when(jnp.logical_not(e20 | e21))
        def _():
            out_ref[pl.ds(r[2], 1), :] += a2

        @pl.when(jnp.logical_not(e30 | e31 | e32))
        def _():
            out_ref[pl.ds(r[3], 1), :] += u[3]

        return 0

    jax.lax.fori_loop(0, ROWS * TILE // 4, body, 0)


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
    idx = jnp.asarray(rng.integers(0, T, N), jnp.int32)
    upd = jnp.asarray(rng.normal(size=(N, 16)).astype(np.float32))
    idx32 = jnp.asarray(rng.integers(0, T, N // 2), jnp.int32)
    upd32 = jnp.asarray(rng.normal(size=(N // 2, 32)).astype(np.float32))
    want = np.asarray(jnp.zeros((T, 16)).at[idx].add(upd))

    @jax.jit
    def trivial(c):
        return c + 1.0 - 1.0

    overhead = chained_ms(trivial, (), reps=50)
    out = {"overhead_ms": round(overhead, 3), "n": N, "t": T}

    def bench(name, kernel, idx_a, upd_a, check=True):
        w = upd_a.shape[1]
        n = upd_a.shape[0]
        call = _mk_call(kernel, n, w, T)

        @jax.jit
        def run(c, idx_a, upd_a):
            res = call(idx_a.reshape(-1, TILE),
                       upd_a + c * 0)
            return c + jnp.sum(res) * 0 + 1, res

        try:
            if check:
                _, got = run(jnp.float32(0), idx_a, upd_a)
                ref = np.asarray(
                    jnp.zeros((T, w)).at[idx_a].add(upd_a))
                np.testing.assert_allclose(np.asarray(got), ref,
                                           rtol=2e-4, atol=2e-4)
            ms = chained_ms(lambda c, i, u: run(c, i, u)[0],
                            (idx_a, upd_a)) - overhead
            out[name] = {"ms": round(ms, 3),
                         "mrows_s": round(n / ms / 1e3, 1)}
        except Exception as e:  # noqa: BLE001
            out[name] = f"ERR {type(e).__name__}: {str(e)[:150]}"
        print(name, out[name], flush=True)

    bench("base_w16", k_base, idx, upd)
    bench("loop2d_w16", k_loop2d, idx, upd)
    bench("unroll2_w16", k_unroll2, idx, upd)
    bench("unroll4_w16", k_unroll4, idx, upd)
    bench("base_w32_half", k_base, idx32, upd32)

    @jax.jit
    def xla_ref(c, idx, upd):
        res = jnp.zeros((T, 16)).at[idx].add(upd + c * 0)
        return c + jnp.sum(res) * 0 + 1

    try:
        ms = chained_ms(xla_ref, (idx, upd)) - overhead
        out["xla_w16"] = {"ms": round(ms, 3),
                          "mrows_s": round(N / ms / 1e3, 1)}
    except Exception as e:  # noqa: BLE001
        out["xla_w16"] = f"ERR {str(e)[:120]}"
    print("xla_w16", out["xla_w16"], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
