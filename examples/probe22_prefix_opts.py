"""probe22: prefix micro-optimizations at the R=8192 step shapes.

probe21 showed the instance stage passing 2M rays/s (2.09M at the
quality-gated bktC S=64, R=8192) with rgb at 1.70M — and the prefix is
now ~60% of the rgb step (instance 3.92 ms vs rgb 4.82; the difference,
0.9 ms, is the whole table backward+adam, so the shared prefix+field
forward is ~3.9 ms). Two exact rewrites + one gated knob:

  - shared top_k at Kmax with per-bucket column slicing (the k smallest
    sort keys ARE the first k of the Kmax smallest) — replaces the
    per-bucket (R, S) row gathers of t/occ_all with (R, Kmax) gathers
    of the compacted t. Bit-exact; landed unconditionally in render.py.
  - ray_jitter: one stratified offset per ray (torch-ngp jitters the
    march start per ray) instead of per sample — S x fewer threefry
    values. Config-gated; needs quality cover before shipping.

Writes /tmp/probe22.json.
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
                n_features=4, n_levels=3, k_occupied=16, k_buckets=BKT_C,
                n_rays=8192)
    variants = {
        "sharedtopk_S64": dict(n_samples=64),
        "sharedtopk_S64_rayjit": dict(n_samples=64, ray_jitter=True),
        "sharedtopk_S48": dict(n_samples=48),
        "sharedtopk_S48_rayjit": dict(n_samples=48, ray_jitter=True),
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
        with open("/tmp/probe22.json", "w") as f:
            json.dump(out, f, indent=2)
    print("PROBE22 OK")


if __name__ == "__main__":
    main()
