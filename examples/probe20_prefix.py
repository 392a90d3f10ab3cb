"""probe20: decompose the bktC S=64 prefix floor (1.35 ms, probe19).

The prefix is now ~half the 2.73 ms rgb step. Hypothesis: the cost is
``coarse_occupancy_mxu``'s (N, 32, 32) f32 intermediate — 1.07 GB of
HBM writes at N=262k (R=4096 x S=64) — not the FLOPs (17 GFLOP) or the
sort. Variants:

  occ_xla        current factorized one-hot einsum chain (f32 interm.)
  occ_xla_bf16   first einsum accumulates bf16 (exact: values are 0/1)
  occ_pallas     VMEM-blocked kernel (kernels/coarse_occ_pallas.py)
  occ_gather     flat take from the 32^3 grid (control)
  sample_only    ray_aabb + sample_points + cell ids (no occupancy)
  route_only     given occ_all, hits+argsort+per-bucket topk+compact
  floor          full trivial-field bktC render (probe19 repeat)

All scan-true: 32 iterations inside one lax.scan dispatch.
Writes /tmp/probe20.json.
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
S = 64
CR = 32  # coarse res
BKT_C = ((0.5, 2), (0.25, 4), (0.25, 8))


def scan_ms(fn, length=32, reps=2):
    @jax.jit
    def scan_fn(chain):
        def body(c, _):
            return fn(c), None
        c, _ = jax.lax.scan(body, chain, None, length=length)
        return c

    c = scan_fn(jnp.float32(0))
    float(c)
    t0 = time.perf_counter()
    c = jnp.float32(0)
    for _ in range(reps):
        c = scan_fn(c)
    float(c)
    return (time.perf_counter() - t0) / reps / length * 1000


def main():
    from instance_nerf_tpu.kernels.coarse_occ_pallas import coarse_occ_lookup
    from instance_nerf_tpu.models.render import (
        OccupancyGrid, coarse_occupancy_mxu, ray_aabb, render_rays,
        sample_points,
    )

    rng = np.random.default_rng(0)
    o = rng.normal(size=(R, 3))
    o = 0.5 + 1.5 * o / np.linalg.norm(o, axis=-1, keepdims=True)
    d = np.asarray([0.5, 0.5, 0.5]) - o + 0.1 * rng.normal(size=o.shape)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    g = 64
    occ_grid = jnp.where(
        jnp.asarray(rng.uniform(size=(g, g, g)) < 0.25), 1e3, 0.0)
    occ = OccupancyGrid(occ_grid, 0.01)
    f = g // CR
    coarse = (occ_grid.reshape(CR, f, CR, f, CR, f).max(axis=(1, 3, 5))
              > 0.01).astype(jnp.float32)

    out = {}

    def record(name, ms):
        out[name] = {"ms": round(ms, 3)}
        print(name, out[name], flush=True)
        with open("/tmp/probe20.json", "w") as fh:
            json.dump(out, fh, indent=2)

    # -- sample-only: aabb + stratified samples + cell ids --------------
    def sample_only(c):
        near, far = ray_aabb(o + c * 0, d)
        far = jnp.maximum(far, near + 1e-4)
        xyz, t, dt = sample_points(jax.random.key(0), o, d, S, near, far)
        ci = jnp.clip((jnp.clip(xyz, 0, 1) * CR).astype(jnp.int32), 0, CR - 1)
        return c + jnp.sum(ci[0, 0]).astype(jnp.float32) * 0 + 1

    record("sample_only", scan_ms(sample_only))

    # -- occupancy variants at fixed N = R*S points ----------------------
    xyz_fix = jnp.asarray(rng.uniform(0, 1, (R * S, 3)), jnp.float32)

    def occ_xla(c):
        v = coarse_occupancy_mxu(occ, xyz_fix + c * 0, CR)
        return c + v[0] * 0 + 1

    record("occ_xla", scan_ms(occ_xla))

    def occ_xla_bf16(c):
        # first contraction accumulates bf16 — exact for {0,1} values
        p = jnp.clip((xyz_fix + c * 0) * CR, 0, CR - 1)
        ci = p.astype(jnp.int32)
        ids = jnp.arange(CR, dtype=jnp.int32)
        cb = coarse.astype(jnp.bfloat16)
        ox = (ci[:, 0:1] == ids[None]).astype(jnp.bfloat16)
        oy = (ci[:, 1:2] == ids[None]).astype(jnp.bfloat16)
        oz = (ci[:, 2:3] == ids[None]).astype(jnp.bfloat16)
        u = jnp.einsum("nx,xyz->nyz", ox, cb,
                       preferred_element_type=jnp.bfloat16)
        v = jnp.einsum("ny,nyz->nz", oy, u,
                       preferred_element_type=jnp.bfloat16)
        w = jnp.einsum("nz,nz->n", oz, v,
                       preferred_element_type=jnp.float32)
        return c + w[0] * 0 + 1

    record("occ_xla_bf16", scan_ms(occ_xla_bf16))

    def occ_pallas(c):
        p = jnp.clip((xyz_fix + c * 0) * CR, 0, CR - 1)
        ci = p.astype(jnp.int32)
        w = coarse_occ_lookup(ci, coarse)
        return c + w[0] * 0 + 1

    record("occ_pallas", scan_ms(occ_pallas))

    def occ_gather(c):
        p = jnp.clip((xyz_fix + c * 0) * CR, 0, CR - 1)
        ci = p.astype(jnp.int32)
        fi = (ci[:, 0] * CR + ci[:, 1]) * CR + ci[:, 2]
        w = jnp.take(coarse.reshape(-1), fi)
        return c + w[0] * 0 + 1

    record("occ_gather", scan_ms(occ_gather))

    # -- routing-only: hits + argsort + per-bucket topk + compact -------
    occ_all_fix = jnp.asarray(rng.uniform(size=(R, S)) < 0.2, jnp.float32)
    t_fix = jnp.asarray(np.sort(rng.uniform(0, 2, (R, S)), axis=1),
                        jnp.float32)

    def route_only(c):
        from instance_nerf_tpu.models.render import _compact_inputs
        occ_all = occ_all_fix + c * 0
        hits = occ_all.sum(axis=-1)
        order = jnp.argsort(hits)
        acc = 0.0
        start = 0
        for frac, k in BKT_C:
            n = int(R * frac)
            sel = jax.lax.dynamic_slice_in_dim(order, start, n)
            start += n
            xyz_k, vd, t_k, dt_k, keep_f = _compact_inputs(
                o[sel], d[sel], t_fix[sel], t_fix[sel] * 0 + 0.01,
                occ_all[sel], occ, k, False)
            acc = acc + jnp.sum(xyz_k[0, 0]) * 0
        return c + acc.astype(jnp.float32) + 1

    record("route_only", scan_ms(route_only))

    # -- full trivial-field floor (probe19 repeat, same harness) --------
    def trivial_apply(params, xyz, vd):
        s = xyz.sum(axis=-1)
        rgb = jnp.broadcast_to(jnp.asarray([0.5, 0.5, 0.5]),
                               (*xyz.shape[:-1], 3))
        return s, rgb, None

    def floor(c):
        outr = render_rays(
            trivial_apply, None, jax.random.key(0), o + c * 0, d,
            n_samples=S, occ=occ, with_instance=False,
            k_occupied=16, occ_coarse_res=CR, k_buckets=BKT_C)
        return c + jnp.sum(outr.rgb) * 0 + 1

    record("floor_bktC", scan_ms(floor))
    print("PROBE20 OK")


if __name__ == "__main__":
    main()
