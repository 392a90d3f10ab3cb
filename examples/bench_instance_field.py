"""Instance-field training/render throughput benchmark (rays/s).

Measures the full staged train step (fwd + bwd + adam) and render-only
path for both encodings:

* ``hash`` — exact shared-corner NGP encoding (reference parity,
  torch-ngp CUDA role; SURVEY.md §2.10)
* ``fast`` — TPU-native brick-grid encoding (models/fast_encode.py)

Timing uses chained-dependency dispatch (each step consumes the previous
step's params) with one final host readback, minus measured per-dispatch
overhead — ``block_until_ready`` does not synchronize through the axon
tunnel (CLAUDE.md).

Usage:
  python examples/bench_instance_field.py --encoding fast --steps 30
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--encoding", default="fast", choices=["fast", "hash"])
    p.add_argument("--n_rays", type=int, default=4096)
    p.add_argument("--n_samples", type=int, default=128)
    p.add_argument("--k_occupied", type=int, default=32)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--stage", default="instance", choices=["rgb", "instance", "render"])
    p.add_argument("--occupancy", type=float, default=1.0,
                   help="fraction of occupancy cells set occupied")
    p.add_argument("--occ_coarse_res", type=int, default=0,
                   help="two-stage occupancy: MXU coarse selection res")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from instance_nerf_tpu.models.render import OccupancyGrid, render_rays
    from instance_nerf_tpu.train.ngp_trainer import (
        InstanceFieldTrainer,
        NGPConfig,
        fast_ngp_config,
    )

    if args.encoding == "fast":
        cfg = fast_ngp_config(
            n_rays=args.n_rays, n_samples=args.n_samples,
            k_occupied=args.k_occupied or None,
            occ_coarse_res=args.occ_coarse_res or None,
        )
    else:
        cfg = NGPConfig(
            n_rays=args.n_rays, n_samples=args.n_samples,
            k_occupied=args.k_occupied or None, dtype="bfloat16",
            occ_coarse_res=args.occ_coarse_res or None,
        )
    trainer = InstanceFieldTrainer(cfg)

    rng = np.random.default_rng(0)
    # rays from a sphere shell looking through the unit cube
    o = rng.normal(size=(args.n_rays, 3))
    o = 0.5 + 1.5 * o / np.linalg.norm(o, axis=-1, keepdims=True)
    d = np.asarray([0.5, 0.5, 0.5]) - o + 0.1 * rng.normal(size=o.shape)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    rgb = jnp.asarray(rng.uniform(size=(args.n_rays, 3)), jnp.float32)
    inst = jnp.asarray(rng.integers(0, cfg.num_instances, args.n_rays), jnp.int32)
    if args.occupancy < 1.0:
        g = trainer.occ.grid.shape[0]
        occ_mask = rng.uniform(size=(g, g, g)) < args.occupancy
        trainer.occ = OccupancyGrid(
            jnp.where(jnp.asarray(occ_mask), 1e3, 0.0), cfg.occ_threshold
        )

    t_compile0 = time.time()
    if args.stage == "render":
        @jax.jit
        def render_step(params, occ_grid, key, o, d):
            out = render_rays(
                trainer._apply, params, key, o, d,
                n_samples=cfg.n_samples,
                occ=OccupancyGrid(occ_grid, cfg.occ_threshold),
                stratified=False, with_instance=True,
                k_occupied=cfg.k_occupied,
                occ_coarse_res=cfg.occ_coarse_res,
            )
            return out.rgb

        def one(chain):
            out = render_step(
                trainer.params, trainer.occ.grid, jax.random.key(0),
                o + chain * 0, d,
            )
            return out[0, 0]

        chain = one(jnp.float32(0))
        float(chain)  # compile + settle
        compile_s = time.time() - t_compile0
        t0 = time.time()
        chain = jnp.float32(0)
        for _ in range(args.steps):
            chain = one(chain)
        float(chain)
        dt = time.time() - t0
    else:
        step_fn = trainer._step_fn(args.stage)

        def one(params, opt_state, chain):
            params, opt_state, losses = step_fn(
                params, opt_state, trainer.occ.grid, jax.random.key(0),
                o + chain * 0, d, rgb, inst,
            )
            return params, opt_state, losses["rgb"]

        params, opt_state, chain = one(trainer.params, trainer.opt_state,
                                       jnp.float32(0))
        float(chain)
        compile_s = time.time() - t_compile0
        t0 = time.time()
        chain = jnp.float32(0)
        for _ in range(args.steps):
            params, opt_state, chain = one(params, opt_state, chain)
        float(chain)
        dt = time.time() - t0

    # per-dispatch overhead through the tunnel
    @jax.jit
    def trivial(c):
        return c + 1.0 - 1.0

    c = trivial(jnp.float32(0))
    float(c)
    t0 = time.time()
    c = jnp.float32(0)
    for _ in range(50):
        c = trivial(c)
    float(c)
    overhead = (time.time() - t0) / 50

    step_s = max(dt / args.steps - overhead, 1e-6)
    print(json.dumps({
        "encoding": args.encoding,
        "stage": args.stage,
        "n_rays": args.n_rays,
        "n_samples": args.n_samples,
        "k_occupied": args.k_occupied,
        "step_ms": round(step_s * 1000, 3),
        "rays_per_s": round(args.n_rays / step_s),
        "compile_s": round(compile_s, 1),
        "dispatch_overhead_ms": round(overhead * 1000, 2),
    }))


if __name__ == "__main__":
    main()
