"""probe25: FCOS backward decomposition + maxpool-backward fix (VERDICT r4 #2).

probe24 (honest, DCE-closed) left: fwd_loss 45.2 ms / fwd_bwd 174.5 ms
/ full 178.3 ms. utils/flops.py's exact jaxpr count shows the step does
11.29 TFLOP (cost_analysis said 1.30 — a ~9x under-count that produced
round-4's "3.7% MFU" claim): the honest forward already runs at
~86 TFLOPS (ABOVE the repo's 81.5-TFLOPS conv microbench) and the full
step sits at 32% MFU. The remaining gap is all in the backward
(129 ms vs the ~93 ms 2x-forward floor). Suspect tested: max_pool's
VJP lowers to SelectAndScatter, a known-slow TPU path; layers.py grew
a separable pad/reshape/max pool whose backward is a dense eq-mask
multiply (forward bit-identical; tests/test_flops_pool.py).

MEASURED OUTCOME (examples/results/probe25_fcos_backward.json): the
reshape pool is a NEGATIVE (full step 234.9 ms vs 178.2 stock — the
dense backward materializes more HBM traffic than SelectAndScatter
saves), so reduce_window stays the default. The honest decomposition:
fwd 45 ms @ 84 TFLOPS, head fwd+bwd 51 ms @ 111 TFLOPS, backbone
fwd+bwd ~123 ms @ ~41 TFLOPS (shipping impl) — the step runs at 63
TFLOPS end-to-end = 32% MFU of v5e peak, within 1.28x of the repo's
own 81.5-TFLOPS conv microbench composite; the remaining inefficiency
is the backbone's backward (low-channel stem/stage-1 convs, GN
bandwidth passes), not assignment/optimizer/batch effects.

Arms (scan-true, 16 steps/dispatch, vgg_EF 160^3 bf16, max_gt=16):
  fwd_all_{rw,rs}       forward consuming ALL head outputs, both pool impls
  fwd_bwd_{rw,rs}       value_and_grad chained through every leaf
  full_{rw,rs}          shipping step (fwd+bwd+adamw), state threaded
  head_only_bwd         FCOSHead alone on precomputed features
  backbone_only_bwd     VGG_FPN alone, sum-of-features loss

Each arm reports analytic TFLOP and achieved TFLOPS. Writes
/tmp/probe25.json atomically per arm.
"""
from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("P25_CPU"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

RES = int(os.environ.get("P25_RES", 160))
MAX_GT = 16
SCAN = 16
OUT = "/tmp/probe25.json"


def write(out):
    tmp = OUT + ".tmp"
    with open(tmp, "w") as f:
        json.dump(out, f, indent=2)
    os.replace(tmp, OUT)


def set_pool_impl(impl: str):
    import instance_nerf_tpu.models.backbones as B
    import instance_nerf_tpu.models.fpn as F
    from instance_nerf_tpu.models import layers

    B.max_pool_3d = partial(layers.max_pool_3d, impl=impl)
    F.max_pool_3d = partial(layers.max_pool_3d, impl=impl)


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
    from instance_nerf_tpu.models.backbones import VGG_FPN
    from instance_nerf_tpu.models.fcos import FCOSHead, fcos_loss, padding_mask
    from instance_nerf_tpu.parallel.train_step import (
        init_fcos_state, make_fcos_train_step, make_optimizer,
    )
    from instance_nerf_tpu.train.fcos_trainer import FCOSConfig, FCOSTrainer
    from instance_nerf_tpu.utils.flops import count_flops

    rng = np.random.default_rng(0)
    grids = jnp.asarray(rng.uniform(0, 1, (1, RES, RES, RES, 4)), jnp.float32)
    sizes = jnp.asarray([[float(RES)] * 3])
    lo = rng.uniform(0, RES * 0.6, (1, MAX_GT, 3))
    ext = rng.uniform(RES * 0.1, RES * 0.35, (1, MAX_GT, 3))
    gt_boxes = jnp.asarray(np.concatenate([lo, np.minimum(lo + ext, RES)], -1),
                           jnp.float32)
    gt_mask = jnp.ones((1, MAX_GT), bool)
    out = {"config": {"res": RES, "max_gt": MAX_GT, "backbone": "vgg_EF",
                      "dtype": "bfloat16", "scan": SCAN}}

    def record(name, ms, flops):
        out[name + "_ms"] = round(ms, 2)
        out[name + "_tflop"] = round(flops / 1e12, 3)
        out[name + "_achieved_tflops"] = round(flops / (ms / 1e3) / 1e12, 1)
        print(name, out[name + "_ms"], "ms,",
              out[name + "_achieved_tflops"], "TFLOPS", flush=True)
        write(out)

    for tag, impl in (("rw", "reduce_window"), ("rs", "reshape")):
        set_pool_impl(impl)
        t = FCOSTrainer(FCOSConfig(batch_size=1, max_gt=MAX_GT))
        model, tx = t.model, make_optimizer()
        state = init_fcos_state(model, tx, jnp.zeros((1, 32, 32, 32, 4)))

        # -- honest forward: consume every head output --------------------
        def fwd_all(c, p, g):
            _, logits, reg, ctr, _ = model.apply(p, g + c * 0, train=True)
            return (jnp.sum(logits) + jnp.sum(reg) + jnp.sum(ctr)
                    ).astype(jnp.float32) * 1e-30

        flops = count_flops(fwd_all, jnp.float32(0), state.params, grids)
        record(f"fwd_all_{tag}", scan_ms(fwd_all, state.params, grids), flops)

        # -- fwd + bwd, chained through every grad leaf --------------------
        def loss_fn(p, g):
            info, logits, reg, ctr, _ = model.apply(p, g, train=True)
            pm = padding_mask(info, sizes)
            losses = fcos_loss(info, logits, reg, ctr, gt_boxes, gt_mask,
                               pad_mask=pm, center_sampling_radius=1.5,
                               iou_loss_type="iou")
            return (losses["loss_cls"] + losses["loss_reg"]
                    + losses["loss_centerness"])

        def fwd_bwd(c, p, g):
            val, grads = jax.value_and_grad(
                lambda pp: loss_fn(pp, g + c * 0))(p)
            gsum = sum(jnp.sum(l).astype(jnp.float32)
                       for l in jax.tree_util.tree_leaves(grads))
            return val + gsum * 1e-30

        flops = count_flops(fwd_bwd, jnp.float32(0), state.params, grids)
        record(f"fwd_bwd_{tag}", scan_ms(fwd_bwd, state.params, grids), flops)

        # -- shipping step, state threaded ---------------------------------
        raw = make_fcos_train_step(model, tx, jit_step=False)

        @jax.jit
        def full_scan(st, chain, g, sz, gb, gm, raw=raw):
            def body(carry, _):
                st, c = carry
                st2, metrics = raw(st, g + c * 0, sz, gb, gm)
                return (st2, metrics["total"]), None
            (st, c), _ = jax.lax.scan(body, (st, chain), None, length=SCAN)
            return c + jnp.sum(
                jax.tree_util.tree_leaves(st.params)[0]
            ).astype(jnp.float32) * 1e-30

        float(full_scan(state, jnp.float32(0), grids, sizes, gt_boxes, gt_mask))
        t0 = time.perf_counter()
        c = jnp.float32(0)
        for _ in range(2):
            c = full_scan(state, c, grids, sizes, gt_boxes, gt_mask)
        float(c)
        ms = (time.perf_counter() - t0) / 2 / SCAN * 1000
        flops = count_flops(raw, state, grids, sizes, gt_boxes, gt_mask)
        record(f"full_{tag}", ms, flops)

    # -- localize: head-only vs backbone-only (reshape pools) -------------
    set_pool_impl("reshape")
    backbone = VGG_FPN(cfg="EF", input_size=RES, dtype=jnp.bfloat16)
    bb_params = backbone.init(jax.random.key(0), grids[:, :32, :32, :32])
    feats_shapes = jax.eval_shape(
        lambda p, g: backbone.apply(p, g), bb_params, grids)
    feats = [jnp.zeros(s.shape, s.dtype) for s in feats_shapes]

    head = FCOSHead(num_convs=4, num_levels=4, dtype=jnp.bfloat16)
    h_params = head.init(jax.random.key(1), [f[:, :8, :8, :8] for f in feats])

    def head_bwd(c, hp, fs):
        def hloss(pp):
            logits, reg, ctr = head.apply(pp, [f + c * 0 for f in fs])
            return sum(jnp.sum(x).astype(jnp.float32) for x in logits + reg + ctr)
        val, grads = jax.value_and_grad(hloss)(hp)
        return val * 1e-30 + sum(
            jnp.sum(l).astype(jnp.float32)
            for l in jax.tree_util.tree_leaves(grads)) * 1e-30

    flops = count_flops(head_bwd, jnp.float32(0), h_params, feats)
    record("head_only_bwd", scan_ms(head_bwd, h_params, feats), flops)

    def bb_bwd(c, bp, g):
        def bloss(pp):
            fs = backbone.apply(pp, g + c * 0)
            return sum(jnp.sum(f).astype(jnp.float32) for f in fs)
        val, grads = jax.value_and_grad(bloss)(bp)
        return val * 1e-30 + sum(
            jnp.sum(l).astype(jnp.float32)
            for l in jax.tree_util.tree_leaves(grads)) * 1e-30

    flops = count_flops(bb_bwd, jnp.float32(0), bb_params, grids)
    record("backbone_only_bwd", scan_ms(bb_bwd, bb_params, grids), flops)

    print("PROBE25 OK")


if __name__ == "__main__":
    main()
