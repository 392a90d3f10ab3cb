"""Fleet-trainer throughput: aggregate rays/s at steps_per_call 1 vs K.

Round-2 measured 6.5k aggregate rays/s for 8 scenes x 512 rays through
the axon tunnel — entirely host-bound (~1.3 s/dispatch). The scan-based
loop (train(steps_per_call=K)) dispatches K fleet updates per host call
with on-device pose gather + ray math, so the tunnel overhead amortizes
K-fold. This driver measures both paths on whatever platform it runs on.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scenes", type=int, default=8)
    p.add_argument("--rays", type=int, default=512)
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--spc", type=int, default=16)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default="/tmp/multiscene_bench.json")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from instance_nerf_tpu.data.nerf_dataset import make_synthetic_nerf_scene
    from instance_nerf_tpu.train.multiscene import MultiSceneFieldTrainer
    from instance_nerf_tpu.train.ngp_trainer import fast_ngp_config

    rng = np.random.default_rng(0)
    scenes = [
        make_synthetic_nerf_scene(rng, n_views=4, hw=(64, 64), n_blobs=2)[0]
        for _ in range(args.scenes)
    ]
    cfg = fast_ngp_config(n_rays=args.rays, n_samples=64, k_occupied=16,
                          occ_res=64, occ_coarse_res=32)
    out = {"scenes": args.scenes, "rays": args.rays, "steps": args.steps}
    for spc in (1, args.spc):
        tr = MultiSceneFieldTrainer(scenes, cfg, seed=0)
        tr.train(spc, stage="rgb", log_every=0, steps_per_call=spc)  # warmup
        t0 = time.time()
        tr.train(args.steps, stage="rgb", log_every=0, steps_per_call=spc)
        dt = time.time() - t0
        rate = args.scenes * args.rays * args.steps / dt
        out[f"spc{spc}"] = {"wall_s": round(dt, 2),
                            "aggregate_rays_s": round(rate)}
        print(f"spc={spc}: {rate:.0f} aggregate rays/s ({dt:.1f}s)",
              flush=True)
    print(json.dumps(out))
    with open(args.out, "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
