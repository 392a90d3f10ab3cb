"""Benchmark entry — prints ONE JSON line for the driver.

Round-1 benchmark: FCOS-RPN (vgg_EF, the shipped config) inference
latency on a dummy 160^3 RGBσ grid — the reference's own benchmark
harness configuration (``nerf_rcnn/run_fcos.py:551-575``: 300-rep
CUDA-event timing on a dummy 4x160^3 input). The reference repo
publishes no number for it (BASELINE.md), so ``vs_baseline`` is computed
against an estimated 30 ms for the same forward on an A100 (~3.5 TFLOP
model forward at ~40% MFU in bf16) — documented estimate, not a
measurement.

Runs on the real TPU chip (default axon platform). bf16 compute.
"""
from __future__ import annotations

import json
import time

import numpy as np

A100_ESTIMATE_MS = 30.0


def main():
    import jax
    import jax.numpy as jnp

    from instance_nerf_tpu.models.backbones import VGG_FPN
    from instance_nerf_tpu.models.fcos import FCOSOverNeRF

    model = FCOSOverNeRF(
        backbone=VGG_FPN(cfg="EF", input_size=160, dtype=jnp.bfloat16),
        dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    grid = jnp.asarray(rng.uniform(0, 1, (1, 160, 160, 160, 4)), jnp.float32)
    params = model.init(jax.random.key(0), grid)

    @jax.jit
    def fwd(p, g):
        info, logits, reg, ctr, _ = model.apply(p, g, train=False)
        return logits, reg, ctr

    jax.block_until_ready(fwd(params, grid))  # compile + warmup
    reps = 30
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fwd(params, grid))
        times.append((time.perf_counter() - t0) * 1000)
    mean_ms = float(np.mean(times))

    print(
        json.dumps(
            {
                "metric": "fcos_rpn_infer_160^3_latency",
                "value": round(mean_ms, 3),
                "unit": "ms",
                "vs_baseline": round(A100_ESTIMATE_MS / mean_ms, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
