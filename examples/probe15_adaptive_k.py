"""probe15: adaptive-K bucket routing throughput (rgb + instance stage).

The instance stage is per-point bound (probe8b) and the rgb stage pays
the table backward per point — so routing rays into K in {8,16,32}
buckets by occupancy hit count (render.py k_buckets) should scale both
stages by ~ R*Kmax / sum(r_i*K_i) (2x for 0.5/8+0.25/16+0.25/32), since
shapes (and therefore speed) are data-independent. This measures the
packed config (T=2^15, L3F4) at:

  fixed K=32 / K=16 (references)
  buckets A: ((0.5, 8), (0.25, 16), (0.25, 32))   expected ~2x vs K=32
  buckets B: ((0.5, 4), (0.25, 8), (0.25, 16))    aggressive, ~2x vs K=16

Chained-dependency timing via InstanceFieldTrainer.benchmark_train
(overhead-subtracted). Writes /tmp/probe15.json.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def main():
    from instance_nerf_tpu.train.ngp_trainer import (
        InstanceFieldTrainer,
        fast_ngp_config,
    )

    common = dict(table_size=2 ** 15, n_levels=3, n_features=4,
                  occ_res=64, occ_coarse_res=32)
    variants = {
        "k32": dict(k_occupied=32),
        "k16": dict(k_occupied=16),
        "bktA_8_16_32": dict(k_occupied=32,
                             k_buckets=((0.5, 8), (0.25, 16), (0.25, 32))),
        "bktB_4_8_16": dict(k_occupied=16,
                            k_buckets=((0.5, 4), (0.25, 8), (0.25, 16))),
        # dense-32 L0: the packed config's coarsest brick level is 32^3
        # <= T (dense-indexed but still gathered+scattered); moving it
        # into the MXU dense grid cuts brick rows by 1/3 ("MXU coarse
        # level is ~free", probe8c). base_res moves to the next level.
        "dense32_L2": dict(k_occupied=32, n_levels=2, base_res=181,
                           dense_res=32),
        "dense32_L2_bktA": dict(k_occupied=32, n_levels=2, base_res=181,
                                dense_res=32,
                                k_buckets=((0.5, 8), (0.25, 16),
                                           (0.25, 32))),
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
    with open("/tmp/probe15.json", "w") as f:
        json.dump(out, f, indent=2)
    print("PROBE15 OK")


if __name__ == "__main__":
    main()
