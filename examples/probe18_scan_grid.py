"""probe18: device-true (lax.scan) throughput grid for the bucketed field.

probe17/17b measurements disagreed by up to 2x on the SAME config —
per-dispatch jitter through the axon tunnel makes ~5 ms dispatches
unmeasurable. This re-measures every candidate with 32 steps inside one
scan dispatch (benchmark_train(scan_steps=32)): per-step time is then
device-true. Also re-checks data-independence (occ 1.0 vs 0.25 —
static shapes say identical).

Writes /tmp/probe18.json.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

BKT_B = ((0.5, 4), (0.25, 8), (0.25, 16))


def main():
    from instance_nerf_tpu.train.ngp_trainer import (
        InstanceFieldTrainer, fast_ngp_config,
    )

    base = dict(n_samples=128, occ_coarse_res=32, table_size=2 ** 15,
                n_features=4)
    variants = {
        "k16_fixed": dict(n_levels=3, k_occupied=16),
        "bktB": dict(n_levels=3, k_occupied=16, k_buckets=BKT_B),
        "bktB_bf16": dict(n_levels=3, k_occupied=16, k_buckets=BKT_B,
                          table_dtype="bfloat16"),
        "dense32_bktB": dict(n_levels=2, base_res=181, dense_res=32,
                             k_occupied=16, k_buckets=BKT_B),
        "dense32_bktB_bf16": dict(n_levels=2, base_res=181, dense_res=32,
                                  k_occupied=16, k_buckets=BKT_B,
                                  table_dtype="bfloat16"),
        "bktB_S64": dict(n_levels=3, k_occupied=16, k_buckets=BKT_B,
                         n_samples=64),
        "bktB_bf16_S64": dict(n_levels=3, k_occupied=16, k_buckets=BKT_B,
                              n_samples=64, table_dtype="bfloat16"),
        "dense32_bktB_bf16_S64": dict(n_levels=2, base_res=181,
                                      dense_res=32, k_occupied=16,
                                      k_buckets=BKT_B, n_samples=64,
                                      table_dtype="bfloat16"),
        "bktB_R16k": dict(n_levels=3, k_occupied=16, k_buckets=BKT_B,
                          n_rays=16384),
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
        with open("/tmp/probe18.json", "w") as f:
            json.dump(out, f, indent=2)

    # data-independence check: same program, occ 1.0 vs 0.25
    tr = InstanceFieldTrainer(fast_ngp_config(**{**base, **variants["bktB"]}))
    for frac in (1.0, 0.25):
        r = tr.benchmark_train(reps=64, stage="rgb", scan_steps=32,
                               occupancy=frac)
        out[f"bktB_occ{frac}"] = {"rgb": {"step_ms": round(r["step_ms"], 2),
                                          "rays_per_s": round(r["rays_per_s"])}}
        print(f"bktB_occ{frac}", json.dumps(out[f"bktB_occ{frac}"]),
              flush=True)
    with open("/tmp/probe18.json", "w") as f:
        json.dump(out, f, indent=2)
    print("PROBE18 OK")


if __name__ == "__main__":
    main()
