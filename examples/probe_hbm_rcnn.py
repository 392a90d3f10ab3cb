"""Compile-only HBM probe for the RCNN device-resident train step.

Reproduces the exact program the retrain queues (rcnn_trainer
_make_index_step over the device store) with ShapeDtypeStruct inputs and
asks the TPU compiler for its peak HBM — no data generated, no step run.
The round-3 retrain OOMed by 268 MB at queue time (retrain2.log); this
answers "does config X fit 15.75 GB?" in one remote compile.

  python examples/probe_hbm_rcnn.py --batch 2 --spc 8 --remat
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--spc", type=int, default=8)
    p.add_argument("--num_scenes", type=int, default=44)
    p.add_argument("--resolution", type=int, default=160)
    p.add_argument("--max_rois", type=int, default=128)
    p.add_argument("--max_gt", type=int, default=16)
    p.add_argument("--bspi", type=int, default=512)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--freeze_backbone", action="store_true")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from instance_nerf_tpu.train.rcnn_trainer import RCNNConfig, RCNNTrainer
    from instance_nerf_tpu.utils.hbm import abstractify, compiled_memory_stats

    cfg = RCNNConfig(
        resolution=args.resolution,
        batch_size=args.batch,
        max_rois=args.max_rois,
        max_gt=args.max_gt,
        batch_size_per_image=args.bspi,
        steps_per_call=args.spc,
        freeze_backbone=args.freeze_backbone,
        device_data=True,
        remat=args.remat,
    )
    trainer = RCNNTrainer(cfg)
    trainer.init_state(total_steps=1000)

    n, r, g = args.num_scenes, args.resolution, args.max_gt
    sds = lambda shape, dt: jax.ShapeDtypeStruct(shape, dt)
    store = {
        "grids": sds((n, r, r, r, 4), jnp.bfloat16),
        "grid_sizes": sds((n, 3), jnp.float32),
        "rois": sds((n, args.max_rois, 6), jnp.float32),
        "roi_mask": sds((n, args.max_rois), jnp.bool_),
        "gt_boxes": sds((n, g, 6), jnp.float32),
        "gt_labels": sds((n, g), jnp.int32),
        "gt_mask": sds((n, g), jnp.bool_),
        "vmasks_packed": sds((n, g, r * r * r // 8), jnp.uint8),
    }
    if args.freeze_backbone:
        del store["grids"]
        c, rr = 256, args.resolution
        store["feats"] = tuple(
            sds((n, rr // s, rr // s, rr // s, c), jnp.bfloat16)
            for s in (4, 8, 16, 32)
        )
    fn = trainer._make_index_step(args.spc)
    idx_shape = (args.spc, args.batch) if args.spc > 1 else (args.batch,)
    try:
        stats = compiled_memory_stats(
            fn,
            abstractify(trainer.params),
            abstractify(trainer.opt_state),
            jax.random.key(0),
            sds(idx_shape, jnp.int32),
            store,
        )
    except Exception as e:  # OOM carries the allocation breakdown
        msg = str(e)
        print(json.dumps({
            "fits": False, "config": vars(args),
            "error": msg[:2000],
        }), flush=True)
        return 1
    out = {"fits": stats["peak_hbm_gib"] < 15.48,  # 15.75 - 0.26 reserved
           "config": vars(args), **stats}
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
