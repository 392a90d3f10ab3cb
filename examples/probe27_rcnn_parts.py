"""probe27: decompose the RCNN RoI-head train step (probe24/25's honest
treatment, applied to the other detector step).

BENCH_r04: rcnn_train_step 377.6 ms at batch 1 x 160^3 (trainable
vgg_EF backbone, 512 sampled rois, 128 mask slots). With the exact
FLOP count (utils/flops.py) the step does ~12.8 TFLOP -> ~34 achieved
TFLOPS = 17% MFU — half the FCOS step's 32%. Where the extra time
goes: candidates are the RoI-align gathers (box 5^3 + mask 14^3
pooling), the uint8 GT-mask projection gather, and the
matcher/sampler.

Arms (scan-true, 16 steps/dispatch, batch 1, 160^3, bf16 backbone):
  full            the shipping step (control; state threaded)
  sample_only     select_training_samples alone
  box_bwd         box_forward + fastrcnn_loss fwd+bwd on STOP-GRAD feats
  mask_bwd        mask_forward + maskrcnn_loss fwd+bwd on STOP-GRAD feats
  backbone_bwd    VGG_EF features fwd+bwd (the conv floor; cf. probe25)
  opt_only        clipped adamw on fixed grads

Each arm reports analytic TFLOP + achieved TFLOPS. Writes
/tmp/probe27.json atomically per arm.
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

if os.environ.get("P27_CPU"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

RES = int(os.environ.get("P27_RES", 160))
SCAN = int(os.environ.get("P27_SCAN", 16))
OUT = "/tmp/probe27.json"


def write(out):
    tmp = OUT + ".tmp"
    with open(tmp, "w") as f:
        json.dump(out, f, indent=2)
    os.replace(tmp, OUT)


def scan_ms(fn, *args, length=SCAN, reps=2):
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
    from instance_nerf_tpu.models.rcnn import (
        NeRF_RCNN, fastrcnn_loss, maskrcnn_loss, select_training_samples,
    )
    from instance_nerf_tpu.train.rcnn_trainer import (
        RCNNConfig, RCNNTrainer, _random_rois, make_rcnn_step_fn,
    )
    from instance_nerf_tpu.utils.flops import count_flops

    t = RCNNTrainer(RCNNConfig(batch_size=1))
    cfg = t.cfg
    t.init_state()
    model, tx, m = t.model, t.tx, t.mask_slots
    rng = np.random.default_rng(0)
    shape = (RES,) * 3
    grids = jnp.asarray(rng.uniform(0, 1, (1, *shape, 4)), jnp.float32)
    sizes = jnp.asarray([[float(RES)] * 3])
    rois = jnp.asarray(_random_rois(rng, RES, cfg.max_rois)[0])[None]
    gt = jnp.asarray(_random_rois(rng, RES, cfg.max_gt)[0])[None]
    gt_labels = jnp.asarray(
        rng.integers(1, cfg.num_classes, (1, cfg.max_gt)), jnp.int32)
    vmasks = jnp.asarray(
        rng.uniform(0, 1, (1, cfg.max_gt, *shape)) < 0.1, jnp.uint8)
    valid = jnp.ones((1, cfg.max_rois), bool)
    gt_mask = jnp.ones((1, cfg.max_gt), bool)
    out = {"config": {"res": RES, "scan": SCAN, "max_rois": cfg.max_rois,
                      "max_gt": cfg.max_gt, "mask_slots": m,
                      "batch_per_image": cfg.batch_size_per_image}}

    write(out)
    TRACE_ONLY = bool(os.environ.get("P27_TRACE_ONLY"))

    def record(name, ms, flops):
        out[name + "_ms"] = round(ms, 2)
        out[name + "_tflop"] = round(flops / 1e12, 3)
        out[name + "_achieved_tflops"] = round(flops / (ms / 1e3) / 1e12, 1)
        print(name, out[name + "_ms"], "ms,",
              out[name + "_achieved_tflops"], "TFLOPS", flush=True)
        write(out)

    # -- full step (control), state threaded --------------------------------
    raw = make_rcnn_step_fn(model, tx, cfg, m)

    @jax.jit
    def full_scan(p, o, chain, *ba):
        def body(carry, _):
            p, o, c, k = carry
            k, sk = jax.random.split(k)
            p2, o2, metrics = raw(p, o, sk, ba[0] + c * 0, *ba[1:])
            return (p2, o2, metrics["total"], k), None
        (p, o, c, _), _ = jax.lax.scan(
            body, (p, o, chain, jax.random.key(0)), None, length=SCAN)
        return c + jnp.sum(
            jax.tree_util.tree_leaves(p)[0]).astype(jnp.float32) * 1e-30

    ba = (grids, sizes, rois, valid, gt, gt_labels, gt_mask, vmasks)
    flops = count_flops(raw, t.params, t.opt_state, jax.random.key(0), *ba)
    if TRACE_ONLY:
        ms = 1.0
    else:
        float(full_scan(t.params, t.opt_state, jnp.float32(0), *ba))
        t0 = time.perf_counter()
        c = jnp.float32(0)
        for _ in range(2):
            c = full_scan(t.params, t.opt_state, c, *ba)
        float(c)
        ms = (time.perf_counter() - t0) / 2 / SCAN * 1000
    record("full", ms, flops)

    # -- sampler alone -------------------------------------------------------
    def sample_only(c, rois, valid, gt, gtl, gtm):
        s = select_training_samples(
            jax.random.key(0), rois + c * 0, valid, gt, gtl, gtm,
            batch_size_per_image=cfg.batch_size_per_image,
            positive_fraction=cfg.positive_fraction,
            fg_iou_thresh=cfg.fg_iou_thresh, bg_iou_thresh=cfg.bg_iou_thresh)
        return (jnp.sum(s.rois) + jnp.sum(s.reg_targets)
                ).astype(jnp.float32) * 1e-30

    flops = count_flops(sample_only, jnp.float32(0), rois, valid, gt,
                        gt_labels, gt_mask)
    record("sample_only", 1.0 if TRACE_ONLY else scan_ms(
        sample_only, rois, valid, gt, gt_labels, gt_mask), flops)

    # -- precompute features + a sample for the isolated head arms ----------
    feats = jax.jit(lambda p, g: model.apply(
        p, g, method=NeRF_RCNN.features))(t.params, grids)
    feats = jax.tree.map(jax.lax.stop_gradient, feats)
    s = jax.jit(lambda k: select_training_samples(
        k, rois, valid, gt, gt_labels, gt_mask,
        batch_size_per_image=cfg.batch_size_per_image,
        positive_fraction=cfg.positive_fraction,
        fg_iou_thresh=cfg.fg_iou_thresh, bg_iou_thresh=cfg.bg_iou_thresh,
    ))(jax.random.key(0))
    order = jnp.argsort(~s.pos[0], stable=True)[:m]
    mrois = s.rois[0][order][None]
    mlab = s.labels[0][order]
    mmidx = s.matched_gt_idx[0][order]
    mpos = s.pos[0][order]

    def box_bwd(c, p, feats, srois, slab, sreg, svalid):
        def lf(pp):
            logits, deltas = model.apply(
                pp, jax.tree.map(lambda f: f + c * 0, feats), srois,
                method=NeRF_RCNN.box_forward)
            cl, bl = fastrcnn_loss(logits, deltas, slab, sreg, svalid)
            return cl + bl
        val, g = jax.value_and_grad(lf)(p)
        return val + sum(jnp.sum(l).astype(jnp.float32)
                         for l in jax.tree_util.tree_leaves(g)) * 1e-30

    flops = count_flops(box_bwd, jnp.float32(0), t.params, feats, s.rois,
                        s.labels, s.reg_targets, s.valid)
    record("box_bwd", 1.0 if TRACE_ONLY else scan_ms(
        box_bwd, t.params, feats, s.rois, s.labels, s.reg_targets,
        s.valid), flops)

    def mask_bwd(c, p, feats, mrois, mlab, mmidx, mpos, vmasks):
        def lf(pp):
            mlogits = model.apply(
                pp, jax.tree.map(lambda f: f + c * 0, feats), mrois,
                method=NeRF_RCNN.mask_forward)
            return maskrcnn_loss(mlogits[0], mrois[0], vmasks[0], mlab,
                                 mmidx, mpos)
        val, g = jax.value_and_grad(lf)(p)
        return val + sum(jnp.sum(l).astype(jnp.float32)
                         for l in jax.tree_util.tree_leaves(g)) * 1e-30

    flops = count_flops(mask_bwd, jnp.float32(0), t.params, feats, mrois,
                        mlab, mmidx, mpos, vmasks)
    record("mask_bwd", 1.0 if TRACE_ONLY else scan_ms(
        mask_bwd, t.params, feats, mrois, mlab, mmidx, mpos, vmasks),
        flops)

    # -- backbone fwd+bwd ----------------------------------------------------
    def bb_bwd(c, p, g):
        def lf(pp):
            fs = model.apply(pp, g + c * 0, method=NeRF_RCNN.features)
            return sum(jnp.sum(f).astype(jnp.float32) for f in fs)
        val, gr = jax.value_and_grad(lf)(p)
        return val * 1e-30 + sum(jnp.sum(l).astype(jnp.float32)
                                 for l in jax.tree_util.tree_leaves(gr)) * 1e-30

    flops = count_flops(bb_bwd, jnp.float32(0), t.params, grids)
    record("backbone_bwd", 1.0 if TRACE_ONLY else scan_ms(
        bb_bwd, t.params, grids), flops)

    # -- optimizer alone -----------------------------------------------------
    grads = jax.tree.map(jnp.ones_like, t.params)

    def opt_only(c, p, o, grads):
        g2 = jax.tree.map(lambda x: x + c * 0, grads)
        upd, _ = tx.update(g2, o, p)
        return jnp.sum(
            jax.tree_util.tree_leaves(upd)[0]).astype(jnp.float32) * 1e-30

    flops = count_flops(opt_only, jnp.float32(0), t.params, t.opt_state, grads)
    record("opt_only", 1.0 if TRACE_ONLY else scan_ms(
        opt_only, t.params, t.opt_state, grads), flops)

    print("PROBE27 OK")


if __name__ == "__main__":
    main()
