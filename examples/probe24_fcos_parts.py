"""probe24: decompose the FCOS train step (VERDICT r4 #2).

BENCH_r04: fcos_train_step = 178.4 ms at batch 1 x 160^3 bf16 with
1.30 TFLOP/step (cost analysis) -> 7.3 achieved TFLOPS = 3.7% MFU,
vs the repo's own 81.5-TFLOPS XLA 3D-conv microbench. ~90% of the step
is therefore NOT conv math running at speed. Candidate sinks: the
(N_loc x K_gt) target assignment, GroupNorm's bandwidth passes,
fp32 loss promotion, the optimizer, batch-1 underutilization.

Scan-true parts (32 steps per dispatch unless noted), vgg_EF 160^3:

  fwd            model.apply train=True, bf16
  loss_only      fcos_loss on PRECOMPUTED head outputs (assignment cost)
  fwd_loss       loss_fn value only
  fwd_bwd        value_and_grad, chained through ALL grad leaves
  opt_only       clip_by_global_norm + adamw on fixed grads
  full           the shipping step, state THREADED through the scan
                 (control = BENCH number)
  full_b{2,4}    batch 2/4 + remat, per-SCENE ms reported
  full_maxgt64   control at max_gt=64 (the bench extra's config)

NOTE the first landed run (committed probe24_fcos_parts.json rev 1) had
two DCE holes — fwd_bwd chained one grad leaf, full_* discarded the
updated state — so its fwd_bwd/full numbers under-measured; this
version closes both.

Default max_gt=16 (the synbench training config). Writes
/tmp/probe24.json atomically per part.
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

if os.environ.get("P24_CPU"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

RES = int(os.environ.get("P24_RES", 160))
MAX_GT = 16
OUT = "/tmp/probe24.json"


def write(out):
    tmp = OUT + ".tmp"
    with open(tmp, "w") as f:
        json.dump(out, f, indent=2)
    os.replace(tmp, OUT)


def scan_ms(fn, *args, length=32, reps=2):
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


def make_batch(batch, max_gt, rng):
    shape = (RES,) * 3
    grids = jnp.asarray(
        rng.uniform(0, 1, (batch, *shape, 4)), jnp.float32)
    sizes = jnp.tile(jnp.asarray([[float(RES)] * 3]), (batch, 1))
    lo = rng.uniform(0, RES * 0.6, (batch, max_gt, 3))
    ext = rng.uniform(RES * 0.1, RES * 0.35, (batch, max_gt, 3))
    boxes = np.concatenate([lo, np.minimum(lo + ext, RES)], -1)
    gt_boxes = jnp.asarray(boxes, jnp.float32)
    gt_mask = jnp.ones((batch, max_gt), bool)
    return grids, sizes, gt_boxes, gt_mask


def main():
    from instance_nerf_tpu.models.fcos import fcos_loss, padding_mask
    from instance_nerf_tpu.parallel.train_step import (
        init_fcos_state, make_fcos_train_step, make_optimizer,
    )
    from instance_nerf_tpu.train.fcos_trainer import FCOSConfig, FCOSTrainer

    t = FCOSTrainer(FCOSConfig(batch_size=1, max_gt=MAX_GT))
    model = t.model
    tx = make_optimizer()
    state = init_fcos_state(model, tx, jnp.zeros((1, 32, 32, 32, 4)))
    rng = np.random.default_rng(0)
    grids, sizes, gt_boxes, gt_mask = make_batch(1, MAX_GT, rng)
    out = {"config": {"res": RES, "max_gt": MAX_GT, "backbone": "vgg_EF",
                      "dtype": "bfloat16"}}

    # -- fwd -------------------------------------------------------------
    def fwd(c, p, g):
        info, logits, reg, ctr, _ = model.apply(p, g + c * 0, train=True)
        return sum(jnp.sum(l).astype(jnp.float32) * 1e-30 for l in logits)

    out["fwd_ms"] = round(scan_ms(fwd, state.params, grids), 2)
    print("fwd", out["fwd_ms"], flush=True); write(out)

    # -- loss on precomputed outputs --------------------------------------
    info, logits, reg, ctr, _ = jax.jit(
        lambda p, g: model.apply(p, g, train=True))(state.params, grids)
    info, logits, reg, ctr = jax.tree.map(
        jax.lax.stop_gradient, (info, logits, reg, ctr))

    def loss_only(c, info, logits, reg, ctr, sizes, gt_boxes, gt_mask):
        pm = padding_mask(info, sizes)
        losses = fcos_loss(
            info, logits, reg, ctr, gt_boxes + c * 0, gt_mask, pad_mask=pm,
            center_sampling_radius=1.5, iou_loss_type="iou")
        return (losses["loss_cls"] + losses["loss_reg"]
                + losses["loss_centerness"])

    out["loss_only_ms"] = round(scan_ms(
        loss_only, info, logits, reg, ctr, sizes, gt_boxes, gt_mask), 2)
    print("loss_only", out["loss_only_ms"], flush=True); write(out)

    # -- fwd + loss --------------------------------------------------------
    def loss_fn(p, g, sizes, gt_boxes, gt_mask):
        info, logits, reg, ctr, _ = model.apply(p, g, train=True)
        pm = padding_mask(info, sizes)
        losses = fcos_loss(
            info, logits, reg, ctr, gt_boxes, gt_mask, pad_mask=pm,
            center_sampling_radius=1.5, iou_loss_type="iou")
        return (losses["loss_cls"] + losses["loss_reg"]
                + losses["loss_centerness"])

    out["fwd_loss_ms"] = round(scan_ms(
        lambda c, p, g, *a: loss_fn(p, g + c * 0, *a),
        state.params, grids, sizes, gt_boxes, gt_mask), 2)
    print("fwd_loss", out["fwd_loss_ms"], flush=True); write(out)

    # -- fwd + bwd ---------------------------------------------------------
    def fwd_bwd(c, p, g, *a):
        val, grads = jax.value_and_grad(
            lambda pp: loss_fn(pp, g + c * 0, *a))(p)
        # chain through EVERY grad leaf — consuming only one leaf lets
        # XLA DCE the other layers' weight-gradient contractions (~half
        # the backward FLOPs); first run of this probe did exactly that
        gsum = sum(jnp.sum(l).astype(jnp.float32)
                   for l in jax.tree_util.tree_leaves(grads))
        return val + gsum * 1e-30

    out["fwd_bwd_ms"] = round(scan_ms(
        fwd_bwd, state.params, grids, sizes, gt_boxes, gt_mask), 2)
    print("fwd_bwd", out["fwd_bwd_ms"], flush=True); write(out)

    # -- optimizer only ------------------------------------------------------
    grads = jax.jit(jax.grad(
        lambda p: loss_fn(p, grids, sizes, gt_boxes, gt_mask)
    ))(state.params)

    def opt_only(c, p, s, grads):
        g2 = jax.tree.map(lambda x: x + c * 0, grads)
        updates, _ = tx.update(g2, s, p)
        leaf = jax.tree_util.tree_leaves(updates)[0]
        return jnp.sum(leaf).astype(jnp.float32) * 1e-30

    out["opt_only_ms"] = round(scan_ms(
        opt_only, state.params, state.opt_state, grads), 2)
    print("opt_only", out["opt_only_ms"], flush=True); write(out)

    # -- full step (control) + batch scaling --------------------------------
    # The scan must THREAD the state: the first run of this probe
    # returned only metrics["total"] from a non-threaded body, so XLA
    # DCE'd the backward+adam (full_b1 45.77 == fwd_loss 45.33).
    for name, batch, remat, mgt in (
        ("full_b1", 1, False, MAX_GT),
        ("full_b1_remat", 1, True, MAX_GT),
        ("full_b2_remat", 2, True, MAX_GT),
        ("full_b4_remat", 4, True, MAX_GT),
        ("full_b1_maxgt64", 1, False, 64),
    ):
        raw = make_fcos_train_step(model, tx, jit_step=False, remat=remat)
        b = make_batch(batch, mgt, np.random.default_rng(1))

        @jax.jit
        def full_scan(st, chain, g, sz, gb, gm, raw=raw):
            def body(carry, _):
                st, c = carry
                st2, metrics = raw(st, g + c * 0, sz, gb, gm)
                return (st2, metrics["total"]), None
            (st, c), _ = jax.lax.scan(body, (st, chain), None, length=16)
            return c + jnp.sum(
                jax.tree_util.tree_leaves(st.params)[0]
            ).astype(jnp.float32) * 1e-30

        float(full_scan(state, jnp.float32(0), *b))  # compile + warm
        t0 = time.perf_counter()
        c = jnp.float32(0)
        for _ in range(2):  # chained reps amortize dispatch overhead
            c = full_scan(state, c, *b)
        float(c)
        ms = (time.perf_counter() - t0) / 2 / 16 * 1000
        out[name + "_ms"] = round(ms, 2)
        out[name + "_per_scene_ms"] = round(ms / batch, 2)
        print(name, round(ms, 2), flush=True); write(out)

    print("PROBE24 OK")


if __name__ == "__main__":
    main()
