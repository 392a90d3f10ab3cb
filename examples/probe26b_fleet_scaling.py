"""probe26b: device-bound fleet scaling with the fixed occupancy path.

probe26 localized the fleet knee to two causes:
  1. the dense occupancy refresh (host lattice + eager decay/max) grew
     superlinearly in B — 149 ms at B=8 -> 3122 ms at B=32;
  2. aggregate rays/s tracks TOTAL rays, not fleet size — B=8 x r=1024
     hit 66.7k while B=16 x r=512 (same 8k total rays) hit 36.0k,
     because per-scene weights shrink the batched-matmul MXU tiles.

This sweep applies both lessons: r >= 1024 rays/scene held constant
while B scales, occupancy refresh as ONE jitted dispatch with
``occ_subsample=0.25`` (multiscene.py:_occ_update_fn). Expected:
aggregate rays/s monotonic in B until the HBM/param bound (~0.19
GiB/scene at these shapes). Arms:

  B in {4, 8, 16, 32, 64} at rays=1024, occ_subsample=0.25
  B=32 occ_subsample=1.0 (jitted dense) -> isolates subsample vs jit win

Writes /tmp/probe26b.json atomically per arm.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

if os.environ.get("P26_CPU"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

OUT = "/tmp/probe26b.json"
SPC = 32
STEPS = 128
SMOKE = bool(os.environ.get("P26_SMOKE"))
if SMOKE:
    SPC, STEPS = 4, 8


def write(out):
    tmp = OUT + ".tmp"
    with open(tmp, "w") as f:
        json.dump(out, f, indent=2)
    os.replace(tmp, OUT)


def main():
    from instance_nerf_tpu.data.nerf_dataset import make_synthetic_nerf_scene
    from instance_nerf_tpu.train.multiscene import MultiSceneFieldTrainer
    from instance_nerf_tpu.train.ngp_trainer import fast_ngp_config

    rng = np.random.default_rng(0)
    n_max = 4 if SMOKE else 64
    scenes = [
        make_synthetic_nerf_scene(rng, n_views=4, hw=(64, 64), n_blobs=2)[0]
        for _ in range(n_max)
    ]
    out = {"config": {"spc": SPC, "steps": STEPS, "stage": "rgb",
                      "table_log2": 15, "levels": 3, "features": 4,
                      "n_samples": 48, "k_occupied": 16, "rays": 1024,
                      "occ_subsample": 0.25}}
    write(out)

    def arm(b, rays, occ_subsample):
        cfg = fast_ngp_config(
            n_rays=rays, n_samples=48, k_occupied=16, occ_res=64,
            occ_coarse_res=32, table_size=2 ** 15, n_levels=3,
            n_features=4, ray_jitter=True, occ_subsample=occ_subsample)
        tr = MultiSceneFieldTrainer(scenes[:b], cfg, seed=0,
                                    device_data=True)
        spc_eff = min(SPC, cfg.occ_update_every)
        tr.train(spc_eff, stage="rgb", log_every=0, steps_per_call=SPC)
        t0 = time.time()
        tr.train(STEPS, stage="rgb", log_every=0, steps_per_call=SPC)
        dt = time.time() - t0
        rate = b * rays * STEPS / dt
        ms = dt / STEPS * 1000
        t0 = time.time()
        for _ in range(4):
            tr._update_occupancy()
        float(tr.occ_grids.sum())  # force through the tunnel
        occ_ms = (time.time() - t0) / 4 * 1000
        peak = None
        try:
            from instance_nerf_tpu.utils.hbm import compiled_memory_stats
            fn = tr._scan_fn("rgb", spc_eff)
            args = (tr.state, tr.occ_grids, jax.random.key(0),
                    tr._poses_dev, tr._nview_dev, tr._imgs_dev)
            if tr._masks_dev is not None:
                args = args + (tr._masks_dev,)
            with tr.mesh:
                peak = compiled_memory_stats(fn, *args)["peak_hbm_gib"]
        except Exception as e:
            peak = f"n/a: {type(e).__name__}"
        return {"B": b, "rays": rays, "occ_subsample": occ_subsample,
                "spc_eff": spc_eff, "step_ms": round(ms, 2),
                "aggregate_rays_s": round(rate),
                "occ_update_ms": round(occ_ms, 1), "peak_hbm_gib": peak}

    arms = ((4, 1024, 0.25), (8, 1024, 0.25), (16, 1024, 0.25),
            (32, 1024, 0.25), (64, 1024, 0.25), (32, 1024, 1.0))
    if SMOKE:
        arms = ((2, 64, 0.25), (4, 64, 1.0))
    for b, rays, sub in arms:
        r = arm(b, rays, sub)
        out[f"B{b}_r{rays}_s{sub}"] = r
        print(json.dumps(r), flush=True)
        write(out)

    print("PROBE26B OK")


if __name__ == "__main__":
    main()
