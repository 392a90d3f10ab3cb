"""probe21: bktC step-shape sweep — does a bigger ray batch or S=48
candidates push the rgb stage past 1.5M rays/s?

probe20 showed the bktC prefix floor (1.44 ms) is BALANCED: sampling
0.53 / coarse-occ einsum 0.44 / routing+topk 0.66 (micro numbers
overlap; the fused floor is 1.44). No single fusion target remains, so
the lever left is amortization: more rays per step amortize fixed
per-dispatch and per-scan work, IF the occupancy einsum doesn't hit an
HBM intermediate wall at N = R*S (probe18 saw bktB R=16384 LOSE 13%).

Writes /tmp/probe21.json.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

BKT_C = ((0.5, 2), (0.25, 4), (0.25, 8))


def main():
    from instance_nerf_tpu.train.ngp_trainer import (
        InstanceFieldTrainer, fast_ngp_config,
    )

    base = dict(occ_coarse_res=32, table_size=2 ** 15,
                n_features=4, n_levels=3, k_occupied=16, k_buckets=BKT_C)
    variants = {
        "bktC_R4k_S64": dict(n_rays=4096, n_samples=64),
        "bktC_R8k_S64": dict(n_rays=8192, n_samples=64),
        "bktC_R8k_S48": dict(n_rays=8192, n_samples=48),
        "bktC_R16k_S48": dict(n_rays=16384, n_samples=48),
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
        with open("/tmp/probe21.json", "w") as f:
            json.dump(out, f, indent=2)
    print("PROBE21 OK")


if __name__ == "__main__":
    main()
