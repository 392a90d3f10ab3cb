"""Benchmark entry — prints ONE JSON line for the driver.

Round-1 benchmark: FCOS-RPN (vgg_EF, the shipped config) inference
latency on a dummy 160^3 RGBσ grid — the reference's own benchmark
harness configuration (``nerf_rcnn/run_fcos.py:551-575``: 300-rep
CUDA-event timing on a dummy 4x160^3 input). The reference repo
publishes no number for it (BASELINE.md), so ``vs_baseline`` is computed
against an estimated 30 ms for the same forward on an A100 (~3.5 TFLOP
forward at ~40% bf16 MFU) — documented estimate, not a measurement.

Timing methodology (axon tunnel): ``block_until_ready`` does NOT
synchronize through the remote PJRT tunnel, so each iteration is chained
on the previous one's scalar output and the final scalar is fetched to
host; the per-dispatch tunnel overhead (measured with a trivial chained
op) is subtracted.
"""
from __future__ import annotations

import json
import time

import numpy as np

A100_ESTIMATE_MS = 30.0


def chained_time_ms(fn, reps: int, warmup: int = 2) -> float:
    """Per-iteration latency of ``fn(carry) -> carry`` with serialized
    dispatches and one final host fetch."""
    c = np.float32(0)
    for _ in range(warmup):
        c = fn(c)
    float(c)
    t0 = time.perf_counter()
    c = np.float32(0)
    for _ in range(reps):
        c = fn(c)
    float(c)
    return (time.perf_counter() - t0) / reps * 1000


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

    # NOTE: grid/params must be *arguments*, not closure constants — the
    # axon remote-compile path serializes captured constants into the
    # compile request (a 64 MB grid trips its size limit).
    @jax.jit
    def fwd(p, g, c):
        info, logits, reg, ctr, _ = model.apply(p, g + c, train=False)
        return (jnp.sum(logits[:, :1]) * 0).astype(jnp.float32)

    @jax.jit
    def trivial(c):
        return c + 1.0 - 1.0

    overhead = chained_time_ms(trivial, reps=50)
    total = chained_time_ms(lambda c: fwd(params, grid, c), reps=20)
    mean_ms = max(total - overhead, 1e-3)

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
