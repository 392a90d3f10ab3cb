"""probe26: localize the fleet-scaling knee (VERDICT r4 weak #3).

The device-bound sweep (multiscene_sweep_tpu.json) read 125k aggregate
rays/s at B=8 but a FLAT ~70k for B=16/32/64 — per-step wall jumped
3.6x from B=8 to B=16 (2x the rays) and then scaled exactly linearly in
B. That is not saturation (saturation keeps aggregate flat at the B=8
rate); it is a resource cliff between the two compiled program shapes.

Arms (device-resident fleet, rgb stage, scan-true spc=32, 128 steps):
  B in {2, 4, 8, 12, 16, 24, 32} at rays=512      -> find the exact knee
  B=8 at rays=1024 (same TOTAL rays as B=16@512)  -> total-rays vs
                                                      B-structure split
  B=4 at rays=2048 (same total again)             -> ditto
  compile-only peak-HBM per B                     -> memory-cliff check

Writes /tmp/probe26.json atomically per arm.
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

OUT = "/tmp/probe26.json"
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
    scenes = [
        make_synthetic_nerf_scene(rng, n_views=4, hw=(64, 64), n_blobs=2)[0]
        for _ in range(32)
    ]
    out = {"config": {"spc": SPC, "steps": STEPS, "stage": "rgb",
                      "table_log2": 15, "levels": 3, "features": 4,
                      "n_samples": 48, "k_occupied": 16}}
    write(out)

    def arm(b, rays):
        cfg = fast_ngp_config(
            n_rays=rays, n_samples=48, k_occupied=16, occ_res=64,
            occ_coarse_res=32, table_size=2 ** 15, n_levels=3,
            n_features=4, ray_jitter=True)
        tr = MultiSceneFieldTrainer(scenes[:b], cfg, seed=0,
                                    device_data=True)
        spc_eff = min(SPC, cfg.occ_update_every)  # rgb stage clamps
        tr.train(spc_eff, stage="rgb", log_every=0, steps_per_call=SPC)
        t0 = time.time()
        tr.train(STEPS, stage="rgb", log_every=0, steps_per_call=SPC)
        dt = time.time() - t0
        rate = b * rays * STEPS / dt
        ms = dt / STEPS * 1000
        # the occupancy refresh alone (B x 64^3 sigma queries; runs
        # every occ_update_every steps INSIDE the timed train wall)
        t0 = time.time()
        for _ in range(4):
            tr._update_occupancy()
        float(tr.occ_grids.sum())  # force through the tunnel
        occ_ms = (time.time() - t0) / 4 * 1000
        # compile-only peak HBM of the scan program actually dispatched
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
        except Exception as e:  # surface drift; keep the timing arms
            peak = f"n/a: {type(e).__name__}"
        return {"B": b, "rays": rays, "spc_eff": spc_eff,
                "step_ms": round(ms, 2), "aggregate_rays_s": round(rate),
                "occ_update_ms": round(occ_ms, 1), "peak_hbm_gib": peak}

    arms = ((2, 512), (4, 512), (8, 512), (12, 512), (16, 512),
            (24, 512), (32, 512), (8, 1024), (4, 2048))
    if SMOKE:
        arms = ((2, 64), (4, 64))
    for b, rays in arms:
        r = arm(b, rays)
        out[f"B{b}_r{rays}"] = r
        print(json.dumps(r), flush=True)
        write(out)

    print("PROBE26 OK")


if __name__ == "__main__":
    main()
