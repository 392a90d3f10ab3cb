"""probe16: fused bucket encode + ray-batch amortization (rgb + instance).

probe15 left the bucketed step overhead-bound: at buckets B
(0.5:4/0.25:8/0.25:16) the per-point work is ~3.7 ms of the 5.4 ms step
(slope from the fixed-K ladder), so ~1.7 ms is prefix/sort/per-bucket
fixed cost. Two levers, both shape-static:

  1. fuse_buckets (render.py): ONE field query over the concatenation of
     all bucket sub-batches — gathers/scatters and MLP matmuls batch
     across buckets; per-call costs are paid once.
  2. Larger ray batches: the fixed cost amortizes over R; per-point cost
     is unchanged (probe14: per-point bound), so rays/s rises toward the
     per-point ceiling.

Writes /tmp/probe16.json.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

BKT_A = ((0.5, 8), (0.25, 16), (0.25, 32))
BKT_B = ((0.5, 4), (0.25, 8), (0.25, 16))


def main():
    from instance_nerf_tpu.train.ngp_trainer import (
        InstanceFieldTrainer,
        fast_ngp_config,
    )

    common = dict(table_size=2 ** 15, n_levels=3, n_features=4,
                  occ_res=64, occ_coarse_res=32)
    variants = {
        "bktB_unfused": dict(k_occupied=16, k_buckets=BKT_B,
                             fuse_buckets=False),
        "bktB_fused": dict(k_occupied=16, k_buckets=BKT_B),
        "bktA_fused": dict(k_occupied=32, k_buckets=BKT_A),
        "bktB_fused_R8k": dict(k_occupied=16, k_buckets=BKT_B,
                               n_rays=8192),
        "bktB_fused_R16k": dict(k_occupied=16, k_buckets=BKT_B,
                                n_rays=16384),
        "bktB_fused_R32k": dict(k_occupied=16, k_buckets=BKT_B,
                                n_rays=32768),
        "bktA_fused_R16k": dict(k_occupied=32, k_buckets=BKT_A,
                                n_rays=16384),
        # dense-32 L0 moves the coarsest brick level into the MXU dense
        # grid (1/3 fewer gathered+scattered rows)
        "dense32_bktB_fused": dict(k_occupied=16, k_buckets=BKT_B,
                                   n_levels=2, base_res=181, dense_res=32),
        "dense32_bktB_fused_R16k": dict(k_occupied=16, k_buckets=BKT_B,
                                        n_levels=2, base_res=181,
                                        dense_res=32, n_rays=16384),
    }
    out = {}
    for name, kw in variants.items():
        tr = InstanceFieldTrainer(fast_ngp_config(**{**common, **kw}))
        row = {}
        for stage in ("rgb", "instance"):
            r = tr.benchmark_train(reps=20, stage=stage)
            row[stage] = {"step_ms": round(r["step_ms"], 2),
                          "rays_per_s": round(r["rays_per_s"])}
        out[name] = row
        print(name, json.dumps(row), flush=True)
        with open("/tmp/probe16.json", "w") as f:
            json.dump(out, f, indent=2)
    print("PROBE16 OK")


if __name__ == "__main__":
    main()
