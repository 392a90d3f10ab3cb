"""probe23: close the rgb stage from 1.75M to 2M rays/s (VERDICT r4 #1b).

Round-4 state: bktC R=8192 S=48 + per-ray jitter = 1.75M rgb / 2.20M
instance (probe21), quality-gated (fast_quality_s48.json). The rgb step
is 4.67 ms; 2M needs 4.10 ms. The rgb-only excess over the instance
stage (~0.95 ms) is the brick-table backward scatter + table adam.

Levers swept here (all scan-true, 32 steps/dispatch, R=8192 S=48
rayjit, coarse-MXU 32, T=2^15):

  ship_bktC        L3F4, ladder 0.5:2/0.25:4/0.25:8 (avg K 4) — the
                   round-4 shipping config, re-measured as control
  bktE             0.625:2/0.25:4/0.125:8 (avg K 3.25) — thinner ladder
  bktG             0.75:2/0.125:4/0.125:8 (avg K 2.5) — thinnest
  L2F6_bktC        2 levels x 6 features (same 12-dim encode, 2/3 the
                   scattered rows -> cheaper table backward)
  L2F6_bktE        both
  f32_mlp_bktC     control: MLP compute in f32 (ship is bf16)

Plus a parts decomposition of the SHIP rgb step for the single-chip
ceiling argument (prefix floor / fwd / fwd+bwd / full step).

Every variant that wins must pass the fast_quality harness before
shipping (quality arms run separately). Writes /tmp/probe23.json
atomically per variant.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("P23_CPU"):  # tiny-shape smoke run off the tunnel
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

R = int(os.environ.get("P23_R", 8192))
S = int(os.environ.get("P23_S", 48))
BKT_C = ((0.5, 2), (0.25, 4), (0.25, 8))
BKT_E = ((0.625, 2), (0.25, 4), (0.125, 8))
BKT_G = ((0.75, 2), (0.125, 4), (0.125, 8))
OUT = "/tmp/probe23.json"


def write(out):
    tmp = OUT + ".tmp"
    with open(tmp, "w") as f:
        json.dump(out, f, indent=2)
    os.replace(tmp, OUT)


def scan_ms(fn, *args, length=32, reps=2):
    """fn(chain, *args) -> scalar; big arrays ride as jit ARGUMENTS
    (the axon remote compiler rejects large captured constants)."""
    @jax.jit
    def scan_fn(chain, *a):
        def body(c, _):
            return fn(c, *a), None
        c, _ = jax.lax.scan(body, chain, None, length=length)
        return c

    c = scan_fn(jnp.float32(0), *args)
    float(c)
    t0 = time.perf_counter()
    c = jnp.float32(0)
    for _ in range(reps):
        c = scan_fn(c, *args)
    float(c)
    return (time.perf_counter() - t0) / reps / length * 1000


def main():
    from instance_nerf_tpu.models.render import OccupancyGrid, render_rays
    from instance_nerf_tpu.train.ngp_trainer import (
        InstanceFieldTrainer, fast_ngp_config,
    )

    base = dict(n_rays=R, n_samples=S, k_occupied=16, occ_coarse_res=32,
                table_size=2 ** 15, n_levels=3, n_features=4,
                k_buckets=BKT_C, ray_jitter=True)
    variants = {
        "ship_bktC": {},
        "bktE": dict(k_buckets=BKT_E),
        "bktG": dict(k_buckets=BKT_G),
        "L2F6_bktC": dict(n_levels=2, n_features=6),
        "L2F6_bktE": dict(n_levels=2, n_features=6, k_buckets=BKT_E),
        "f32_mlp_bktC": dict(dtype="float32"),
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
        write(out)

    # ---- parts decomposition of the ship config (ceiling argument) ----
    tr = InstanceFieldTrainer(fast_ngp_config(**base))
    rng = np.random.default_rng(0)
    o = rng.normal(size=(R, 3))
    o = 0.5 + 1.5 * o / np.linalg.norm(o, axis=-1, keepdims=True)
    d = np.asarray([0.5, 0.5, 0.5]) - o + 0.1 * rng.normal(size=o.shape)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    rgb_t = jnp.asarray(rng.uniform(size=(R, 3)), jnp.float32)
    occ_grid = tr.occ.grid
    params = tr.params
    opt_state = tr.opt_state
    cfg = tr.cfg

    def render_loss(p, chain, apply_fn, occ_g, o_, d_, rgb_):
        outr = render_rays(
            apply_fn, p, jax.random.key(0), o_ + chain * 0, d_,
            n_samples=S, occ=OccupancyGrid(occ_g, cfg.occ_threshold),
            with_instance=False, k_occupied=cfg.k_occupied,
            occ_coarse_res=32, k_buckets=cfg.k_buckets,
            fuse_buckets=True, ray_jitter=True,
        )
        return jnp.mean((outr.rgb - rgb_) ** 2)

    def trivial_apply(p, xyz, vd):
        s = xyz[:, 0] * p
        return s, jnp.stack([s, s, s], -1), None

    parts = {}
    parts["prefix_floor_fwd"] = round(scan_ms(
        lambda c, *a: render_loss(jnp.float32(1.0), c, trivial_apply, *a),
        occ_grid, o, d, rgb_t), 3)
    parts["full_fwd"] = round(scan_ms(
        lambda c, p, *a: render_loss(p, c, tr._apply, *a),
        params, occ_grid, o, d, rgb_t), 3)

    def fwd_bwd(c, p, *a):
        # chain through the value; a grad leaf keeps the backward live
        val, g = jax.value_and_grad(
            lambda pp: render_loss(pp, c, tr._apply, *a))(p)
        leaf = jax.tree_util.tree_leaves(g)[0]
        # *1e-30 (not *0) so XLA cannot DCE the backward pass
        return val + jnp.sum(leaf).astype(jnp.float32) * 1e-30

    parts["full_fwd_bwd"] = round(scan_ms(
        fwd_bwd, params, occ_grid, o, d, rgb_t), 3)

    step = tr._step_fn("rgb")

    def full_step(c, p, s_, occ_g, o_, d_, rgb_):
        p2, s2, losses = step(p, s_, occ_g, jax.random.key(0),
                              o_ + c * 0, d_, rgb_,
                              jnp.zeros((R,), jnp.int32))
        # chain through an UPDATED param leaf — returning only the loss
        # lets XLA DCE the whole backward+adam (first run of this part
        # measured fwd-only, 3.60 ms == full_fwd)
        leaf = jax.tree_util.tree_leaves(p2)[0]
        return losses["rgb"] + jnp.sum(leaf).astype(jnp.float32) * 1e-30

    parts["full_step"] = round(scan_ms(
        full_step, params, opt_state, occ_grid, o, d, rgb_t), 3)
    out["ship_rgb_parts_ms"] = parts
    print("parts", json.dumps(parts), flush=True)
    write(out)
    print("PROBE23 OK")


if __name__ == "__main__":
    main()
