"""probe19: bucket-ladder + prefix decomposition at S=64 (scan-true).

probe18 (device-true): bktB_S64 = 4.09 ms rgb / 3.04 ms instance at
R=4096. S only changes the prefix (buckets fix the compacted point
count at R*avgK = 32768), so the remaining levers are:

  - the bucket ladder itself (avg K): bktC (0.5:2/0.25:4/0.25:8, avg 4)
    and bktD (0.75:4/0.125:8/0.125:16, avg 6) vs bktB (avg 8)
  - fewer candidates: S=48
  - cheaper coarse selection: occ_coarse_res=16 (the one-hot einsum is
    8x fewer FLOPs than 32; selection gets more conservative)
  - prefix+composite floor: full render_rays under a TRIVIAL field
    (analytic sigma/rgb, no params) — forward-only is the right
    decomposition because the backward never re-traverses the prefix
    (xyz_k is constant wrt params).

Writes /tmp/probe19.json.
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
BKT_C = ((0.5, 2), (0.25, 4), (0.25, 8))
BKT_D = ((0.75, 4), (0.125, 8), (0.125, 16))
R = 4096


def main():
    from instance_nerf_tpu.models.render import OccupancyGrid, render_rays
    from instance_nerf_tpu.train.ngp_trainer import (
        InstanceFieldTrainer, fast_ngp_config,
    )

    base = dict(n_rays=R, occ_coarse_res=32, table_size=2 ** 15,
                n_features=4, n_levels=3, k_occupied=16)
    variants = {
        "bktB_S64": dict(n_samples=64, k_buckets=BKT_B),
        "bktC_S64": dict(n_samples=64, k_buckets=BKT_C),
        "bktD_S64": dict(n_samples=64, k_buckets=BKT_D),
        "bktB_S48": dict(n_samples=48, k_buckets=BKT_B),
        "bktC_S48": dict(n_samples=48, k_buckets=BKT_C),
        "bktB_S64_coarse16": dict(n_samples=64, k_buckets=BKT_B,
                                  occ_coarse_res=16),
    }
    out = {}
    for name, kw in variants.items():
        tr = InstanceFieldTrainer(fast_ngp_config(**{**base, **kw}))
        row = {}
        for stage in ("rgb", "instance"):
            r = tr.benchmark_train(reps=64, stage=stage, scan_steps=32)
            row[stage] = {"step_ms": round(r["step_ms"], 2),
                          "rays_per_s": round(r["rays_per_s"])}
        out[name] = row
        print(name, json.dumps(row), flush=True)
        with open("/tmp/probe19.json", "w") as f:
            json.dump(out, f, indent=2)

    # -- prefix+composite floor: trivial analytic field ------------------
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

    def trivial_apply(params, xyz, vd):
        s = xyz.sum(axis=-1)
        rgb = jnp.broadcast_to(jnp.asarray([0.5, 0.5, 0.5]),
                               (*xyz.shape[:-1], 3))
        return s, rgb, None

    for name, s_cand, bkt in (("prefix_floor_S64", 64, BKT_B),
                              ("prefix_floor_S64_bktC", 64, BKT_C)):
        @jax.jit
        def scan_fn(chain, occ_grid=occ_grid, s_cand=s_cand, bkt=bkt):
            occ = OccupancyGrid(occ_grid, 0.01)

            def body(c, _):
                outr = render_rays(
                    trivial_apply, None, jax.random.key(0), o + c * 0, d,
                    n_samples=s_cand, occ=occ, with_instance=False,
                    k_occupied=16, occ_coarse_res=32, k_buckets=bkt)
                return c + jnp.sum(outr.rgb) * 0 + 1, None

            c, _ = jax.lax.scan(body, chain, None, length=32)
            return c

        c = scan_fn(jnp.float32(0))
        float(c)
        t0 = time.perf_counter()
        c = jnp.float32(0)
        for _ in range(2):
            c = scan_fn(c)
        float(c)
        ms = (time.perf_counter() - t0) / 2 / 32 * 1000
        out[name] = {"ms": round(ms, 3)}
        print(name, out[name], flush=True)
    with open("/tmp/probe19.json", "w") as f:
        json.dump(out, f, indent=2)
    print("PROBE19 OK")


if __name__ == "__main__":
    main()
