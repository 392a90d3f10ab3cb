"""probe23b: S=32 candidates + batch-shape tail for the rgb 2M push.

probe23 landed: L2F6_bktE = 1.887M rgb / 2.196M instance (scan-true,
R=8192 S=48 rayjit). Its parts table says the PREFIX (sampling +
coarse-occ + route/topk) is 2.46 ms of the 5.23 ms ship rgb step and
scales with R*S — S=32 candidates cut it ~1/3. Quality question
(thin-structure coverage with 32 stratified candidates) goes to the
fast_quality harness; this probe is throughput only.

Variants (all rayjit, coarse-MXU 32, T=2^15):
  bktC_S32        L3F4, ladder 0.5:2/0.25:4/0.25:8
  bktE_S32        L3F4, 0.625:2/0.25:4/0.125:8
  L2F6_bktE_S32   2 levels x 6 features + bktE
  L2F6_bktE_S48   control repeat of probe23's winner (same dispatch day)
  L2F6_bktE_S32_R12k  R=12288 amortization check

Writes /tmp/probe23b.json atomically per variant.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

BKT_C = ((0.5, 2), (0.25, 4), (0.25, 8))
BKT_E = ((0.625, 2), (0.25, 4), (0.125, 8))
OUT = "/tmp/probe23b.json"


def main():
    from instance_nerf_tpu.train.ngp_trainer import (
        InstanceFieldTrainer, fast_ngp_config,
    )

    base = dict(n_rays=8192, n_samples=32, k_occupied=16,
                occ_coarse_res=32, table_size=2 ** 15, n_levels=3,
                n_features=4, k_buckets=BKT_C, ray_jitter=True)
    variants = {
        "bktC_S32": {},
        "bktE_S32": dict(k_buckets=BKT_E),
        "L2F6_bktE_S32": dict(n_levels=2, n_features=6, k_buckets=BKT_E),
        "L2F6_bktE_S48": dict(n_levels=2, n_features=6, k_buckets=BKT_E,
                              n_samples=48),
        "L2F6_bktE_S32_R12k": dict(n_levels=2, n_features=6,
                                   k_buckets=BKT_E, n_rays=12288),
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
        tmp = OUT + ".tmp"
        with open(tmp, "w") as f:
            json.dump(out, f, indent=2)
        os.replace(tmp, OUT)
    print("PROBE23B OK")


if __name__ == "__main__":
    main()
