"""Detector recipe at scale on synthetic 3D-FRONT-like rooms (TPU).

VERDICT round-1 item 4: prove the FCOS -> RCNN training recipe converges
beyond a single overfit scene. Generates N synthetic 160^3 rooms
(floor/walls + class-conditioned furniture, 10 3D-FRONT classes), trains
FCOS on the train split, evaluates proposal Recall/AP on the held-out
val split, exports FCOS proposals for every scene, trains the RCNN (backbone
grafted from the RPN ckpt and fine-tuned with the heads, the reference's
canonical recipe — train_rcnn.sh, run_rcnn.py:410-427), and evaluates
class-aware box+mask mAP on val.

Writes eval.json with all metrics. Run (TPU, ~30-60 min):
  python examples/detector_benchmark.py --root /tmp/synbench \
      --out examples/results/detector_synbench.json
"""
from __future__ import annotations

import argparse
import json
import logging
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/synbench")
    p.add_argument("--out", default="examples/results/detector_synbench.json")
    p.add_argument("--num_scenes", type=int, default=64)
    p.add_argument("--resolution", type=int, default=160)
    p.add_argument("--num_boxes", type=int, default=8)
    p.add_argument("--fcos_epochs", type=int, default=60)
    p.add_argument("--rcnn_epochs", type=int, default=12)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--skip_gen", action="store_true")
    p.add_argument("--resume", action="store_true",
                   help="resume FCOS training from save_path (restart "
                        "robustness for flaky links)")
    p.add_argument("--skip_fcos", action="store_true",
                   help="reuse existing FCOS ckpt + exported rois/; jump "
                        "straight to the RCNN stage")
    p.add_argument("--rcnn_steps_per_call", type=int, default=8,
                   help="RCNN updates per dispatch (lax.scan)")
    p.add_argument("--no_device_data", action="store_true",
                   help="disable the device-resident train split (falls "
                        "back to per-step host batch uploads)")
    p.add_argument("--freeze_backbone", action="store_true",
                   help="freeze the grafted backbone during RCNN training "
                        "(the reference's OPTIONAL --freeze_backbone mode, "
                        "run_rcnn.py:346-348; the canonical train_rcnn.sh "
                        "recipe trains the backbone — the default here)")
    p.add_argument("--rcnn_lr", type=float, default=1e-3)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU platform (the axon sitecustomize "
                        "overrides JAX_PLATFORMS; see CLAUDE.md)")
    p.add_argument("--rcnn_bspi", type=int, default=512,
                   help="sampled rois per image (CPU diag runs use less)")
    p.add_argument("--rcnn_max_rois", type=int, default=128)
    p.add_argument("--rcnn_remat", action="store_true",
                   help="rematerialize the backbone forward in the RCNN "
                        "backward (needed for the trainable-backbone "
                        "recipe at batch 4 x 160^3, like FCOS)")
    p.add_argument("--rcnn_save_interval", type=int, default=4,
                   help="param-only checkpoint cadence (epochs) between "
                        "evals — restart insurance for the flaky link")
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s: %(message)s")
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import numpy as np

    from instance_nerf_tpu.data.synthetic import write_dataset

    root = args.root
    res = (args.resolution,) * 3
    t0 = time.time()
    if not args.skip_gen:
        write_dataset(
            root, num_scenes=args.num_scenes, grid_size=res,
            num_boxes=args.num_boxes, seed=args.seed,
            splits=(0.7, 0.2), style="room", compress=False,
        )
        print(f"[gen] {args.num_scenes} room scenes @ {res} in "
              f"{time.time()-t0:.0f}s -> {root}", flush=True)

    # ---- stage 1: FCOS proposal network ---------------------------------
    from instance_nerf_tpu.train.fcos_trainer import FCOSConfig, FCOSTrainer

    fcos_ckpt = os.path.join(root, "fcos_ckpt")
    fcfg = FCOSConfig(
        features_path=os.path.join(root, "features"),
        boxes_path=os.path.join(root, "metadata"),
        dataset_split=os.path.join(root, "dataset_split.json"),
        save_path=fcos_ckpt,
        resolution=args.resolution,
        batch_size=args.batch_size,
        num_epochs=args.fcos_epochs,
        eval_interval=max(args.fcos_epochs // 6, 1),
        resume=args.resume,
        rot_scale_prob=0.0,
        preload=True,
        # one bf16 upload of the train split instead of a 131 MB f32
        # batch upload per step — through the ~30 MB/s axon tunnel the
        # per-step upload alone was 4.4 s/it (measured round 3).
        # NOTE: the device-resident loop trains single-device (plain
        # jax.jit, no (data, sp) mesh) — correct for this single-chip
        # benchmark; use --no_device_data for multi-chip SPMD runs
        device_data=not args.no_device_data,
        steps_per_call=4,
        # rooms have <=15 boxes; max_gt=64 blows HBM at batch 4 x 160^3
        # (pairwise target-assignment tensors) — 16 fits with remat
        max_gt=16,
        remat=True,
        seed=args.seed,
    )
    fcos_metrics = {}
    fcos_train_s = 0.0
    fcos_provenance = {"skipped": False, "ckpt": fcos_ckpt,
                       "epochs": args.fcos_epochs,
                       "batch_size": args.batch_size, "seed": args.seed}
    marker = os.path.join(root, "rois", ".fcos_exported")
    if args.skip_fcos and os.path.exists(marker):
        # reuse the existing ckpt + exports; reload metrics if recorded
        # and record WHICH checkpoint produced the proposals (VERDICT r4
        # weak #7: a 0.0 fcos_train_s with no ckpt identity made the
        # headline unreproducible from the JSON alone)
        steps = sorted(d for d in os.listdir(fcos_ckpt)
                       if d.startswith("step_")) if os.path.isdir(fcos_ckpt) \
            else []
        fcos_provenance.update(
            skipped=True, ckpt_steps=steps,
            ckpt_mtime=os.path.getmtime(fcos_ckpt)
            if os.path.isdir(fcos_ckpt) else None)
        mpath = os.path.join(root, "fcos_val.json")
        if os.path.exists(mpath):
            with open(mpath) as f:
                fcos_metrics = json.load(f)
        print("[fcos] skipped (reusing ckpt + exported rois)", flush=True)
    else:
        ft = FCOSTrainer(fcfg)
        t1 = time.time()
        ft.train_loop()
        fcos_train_s = time.time() - t1
        val_ds = ft.make_dataset("val")
        fcos_metrics = ft.eval(val_ds)
        print("[fcos] val:", json.dumps(fcos_metrics), flush=True)
        with open(os.path.join(root, "fcos_val.json"), "w") as f:
            json.dump(fcos_metrics, f)

        # ---- stage 2: export FCOS proposals for ALL scenes -> rois/ -----
        # (replaces the generator's jittered stand-ins with real RPN
        # output, the run_fcos --save_results -> run_rcnn bridge)
        export_dir = os.path.join(root, "fcos_out")
        from instance_nerf_tpu.data.datasets import RPNDataset

        all_ds = RPNDataset(  # every scene in features/ (train+val+test)
            features_path=os.path.join(root, "features"),
            boxes_path=os.path.join(root, "metadata"),
        )
        ft.eval(all_ds, save_results_path=export_dir)
        rois_dir = os.path.join(root, "rois")
        shutil.rmtree(rois_dir, ignore_errors=True)
        shutil.move(os.path.join(export_dir, "proposals"), rois_dir)
        open(marker, "w").close()
        print(f"[fcos] proposals exported for {len(all_ds)} scenes",
              flush=True)
        del ft  # free the preloaded grids before the RCNN stage

    # ---- stage 3: RCNN RoI heads on FCOS proposals ----------------------
    from instance_nerf_tpu.train.rcnn_trainer import RCNNConfig, RCNNTrainer

    rcnn_save = os.path.join(root, "rcnn_ckpt")
    # flaky-link restart: continue from the latest RCNN params if present
    have_rcnn_ckpt = args.resume and os.path.isdir(rcnn_save) and any(
        d.startswith("step_") for d in os.listdir(rcnn_save)
    )
    rcfg = RCNNConfig(
        dataset_root=root,
        save_path=rcnn_save,
        rpn_ckpt="" if have_rcnn_ckpt else fcos_ckpt,
        rcnn_ckpt=rcnn_save if have_rcnn_ckpt else "",
        resolution=args.resolution,
        batch_size=args.batch_size,
        num_epochs=args.rcnn_epochs,
        eval_interval=max(args.rcnn_epochs // 5, 1),
        max_gt=16,
        max_rois=args.rcnn_max_rois,
        eval_rois=min(64, args.rcnn_max_rois),
        batch_size_per_image=args.rcnn_bspi,
        cache_scenes=True,
        seed=args.seed,
        steps_per_call=args.rcnn_steps_per_call,
        freeze_backbone=args.freeze_backbone,
        lr=args.rcnn_lr,
        device_data=not args.no_device_data,
        save_interval=args.rcnn_save_interval,
        remat=args.rcnn_remat,
    )
    rt = RCNNTrainer(rcfg)
    t2 = time.time()
    rt.train_loop()
    rcnn_train_s = time.time() - t2
    from instance_nerf_tpu.data.datasets import SegmentationDataset

    rcnn_metrics = rt.eval(
        SegmentationDataset("val", root, cache=False)
    )
    print("[rcnn] val:", json.dumps(rcnn_metrics), flush=True)

    out = {
        "config": {
            "num_scenes": args.num_scenes,
            "resolution": args.resolution,
            "splits": {"train": 0.7, "val": 0.2},
            "fcos_epochs": args.fcos_epochs,
            "rcnn_epochs": args.rcnn_epochs,
            "batch_size": args.batch_size,
            "freeze_backbone": args.freeze_backbone,
        },
        "fcos_val": fcos_metrics,
        "fcos_provenance": fcos_provenance,
        "rcnn_val": rcnn_metrics,
        "fcos_train_s": round(fcos_train_s, 1),
        "rcnn_train_s": round(rcnn_train_s, 1),
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print("DETECTOR BENCH OK", json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
