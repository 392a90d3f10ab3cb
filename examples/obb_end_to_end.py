"""Rotated-box (OBB) FCOS end-to-end drive (VERDICT round-1 item 5).

Generates yaw-rotated synthetic rooms, trains FCOS with
``rotated_bbox=True`` (8-param MidpointOffset regression, rotated NMS —
ref: fcos/loss.py:321-380, fcos/utils.py:12-105), and evaluates theta
recovery on a held-out split with full 3D rotated IoU: for each GT OBB,
the best-matching proposal's cal_iou_3d. Reports recall@{0.25,0.5,0.7}
and mean best-IoU.

Chunked (round-4): training runs in --chunk_epochs slices, each followed
by a rotated-IoU eval and a partial-result write to --out, so a queue
timeout costs at most one chunk (VERDICT r3 weak #4: the 160-epoch
continuation was zeroed because results were only written at run end).
``--resume`` restores the latest checkpoint, so re-running the same
command continues where the last chunk stopped.

Run (TPU): python examples/obb_end_to_end.py --out examples/results/obb_e2e.json
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
    p.add_argument("--root", default="/tmp/synobb")
    p.add_argument("--out", default="examples/results/obb_e2e.json")
    p.add_argument("--num_scenes", type=int, default=24)
    p.add_argument("--resolution", type=int, default=128)
    p.add_argument("--num_boxes", type=int, default=6)
    p.add_argument("--epochs", type=int, default=80)
    p.add_argument("--chunk_epochs", type=int, default=40,
                   help="epochs per train->eval->write cycle (0 = all)")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--skip_gen", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--eval_only", action="store_true",
                   help="eval the latest checkpoint, write results, exit")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU platform (the axon sitecustomize "
                        "overrides JAX_PLATFORMS; see CLAUDE.md)")
    args = p.parse_args(argv)

    import logging

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s: %(message)s")
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from instance_nerf_tpu.data.synthetic import write_dataset

    root = args.root
    res = (args.resolution,) * 3
    if not args.skip_gen:
        t0 = time.time()
        write_dataset(root, num_scenes=args.num_scenes, grid_size=res,
                      num_boxes=args.num_boxes, seed=args.seed,
                      splits=(0.7, 0.3), style="room", rotated=True,
                      compress=False)
        print(f"[gen] {args.num_scenes} rotated rooms in {time.time()-t0:.0f}s",
              flush=True)

    from instance_nerf_tpu.train.fcos_trainer import FCOSConfig, FCOSTrainer

    cfg = FCOSConfig(
        features_path=os.path.join(root, "features"),
        boxes_path=os.path.join(root, "boxes_obb"),  # 7-param grid OBBs
        dataset_split=os.path.join(root, "dataset_split.json"),
        save_path=os.path.join(root, "fcos_obb_ckpt"),
        resolution=args.resolution,
        rotated_bbox=True,
        iou_loss_type="iou",
        # direct smooth-L1 on the midpoint offsets (alpha/beta) — the
        # reference's tight-theta lever (loss.py:570-577, run_fcos.py:107);
        # rotated-IoU alone plateaus at loose theta (obb_e2e recall@0.5
        # 0.45 at 80 epochs with IoU-only)
        use_additional_l1_loss=True,
        # 2D corner-projection consistency: the rotated diagonal corners
        # move linearly with yaw, giving theta a gradient where the
        # -log(IoU) surface flattens (round-5 theta attack; obb_e2e at
        # 120 epochs read theta_err_mean 40 deg without it)
        proj2d_loss_weight=1.0,
        batch_size=args.batch_size,
        num_epochs=args.epochs,
        stop_after_epochs=max(0, args.chunk_epochs),
        eval_interval=10 ** 9,  # AABB eval metrics don't apply; eval below
        preload=True,
        device_data=True,  # grids resident in HBM; no per-step uploads
        max_gt=16,  # rooms have <=9 boxes; shrinks pairwise target tensors
        remat=True,
        steps_per_call=4,
        save_interval=20,
        resume=args.resume,
        seed=args.seed,
    )
    t = FCOSTrainer(cfg)

    # --- rotated-IoU eval on the held-out split ---------------------------
    from instance_nerf_tpu.ops.rotated_iou import cal_iou_3d

    def canon_theta(boxes):
        """Canonicalize the OBB yaw under the box's symmetry group: an
        OBB is invariant under (w, l, th) -> (l, w, th + 90deg) and
        th -> th + 180deg. Raw angle diffs count a representation swap
        as a ~90deg 'error' on a box-identical prediction (VERDICT r4
        weak #4 read the uncanonicalized numbers). Returns (theta in
        [-90, 90), aspect = long/short extent)."""
        b = np.asarray(boxes, np.float64)
        w, l, th = b[..., 3], b[..., 4], b[..., 6]
        th = np.where(w < l, th + np.pi / 2, th)  # canonical: w >= l
        th = (th + np.pi / 2) % np.pi - np.pi / 2
        aspect = np.maximum(w, l) / np.maximum(np.minimum(w, l), 1e-6)
        return th, aspect

    def evaluate(val, epochs_done, train_s):
        per_scene = []
        best_ious_all = []
        dth_all, aspect_all = [], []
        for i in range(len(val)):
            scene, grid, gt = val.get(i)
            boxes, scores, _ = t.predict_scene(grid)  # (P, 7) rotated
            k = min(len(scores), 300)
            order = np.argsort(-scores)[:k]
            pb = jnp.asarray(boxes[order], jnp.float32)
            gtb = jnp.asarray(gt, jnp.float32)
            iou = np.asarray(cal_iou_3d(gtb[:, None, :], pb[None, :, :]))
            best = iou.max(axis=1) if iou.size else np.zeros(len(gt))
            best_ious_all.extend(best.tolist())
            # theta diagnosis: |wrapped angle error| of each GT's best
            # match (distinguishes "theta collapses to 0" from
            # "size/center off")
            if iou.size:
                bidx = iou.argmax(axis=1)
                gt_th, gt_asp = canon_theta(np.asarray(gt))
                pr_th, _ = canon_theta(np.asarray(boxes[order])[bidx])
                dth = gt_th - pr_th
                dth = np.abs((dth + np.pi / 2) % np.pi - np.pi / 2)
            else:
                dth = np.zeros(len(gt))
                gt_asp = np.ones(len(gt))
            dth_all.extend(dth.tolist())
            aspect_all.extend(np.asarray(gt_asp).tolist())
            per_scene.append(
                {"scene": scene, "gt": int(len(gt)),
                 "best_iou_mean": float(best.mean()),
                 "theta_err_deg_mean": float(np.degrees(dth).mean())})
            print(f"[eval] {scene}: mean best rotated IoU {best.mean():.3f} "
                  f"(min {best.min():.3f})", flush=True)

        best_ious = np.asarray(best_ious_all)
        dth_deg = np.degrees(np.asarray(dth_all))
        aspect = np.asarray(aspect_all)
        ident = aspect >= 1.2  # yaw is only identifiable off-square
        out = {
            "config": {"num_scenes": args.num_scenes,
                       "resolution": args.resolution, "epochs": epochs_done,
                       "epochs_target": args.epochs},
            "train_s": round(train_s, 1),
            "val_gt_count": int(best_ious.size),
            "mean_best_riou": float(best_ious.mean()),
            "recall_riou_25": float((best_ious >= 0.25).mean()),
            "recall_riou_50": float((best_ious >= 0.5).mean()),
            "recall_riou_70": float((best_ious >= 0.7).mean()),
            # canonicalized yaw error (representation-swap-invariant)
            "theta_err_deg_mean": float(dth_deg.mean()) if dth_deg.size else None,
            "theta_err_deg_median": float(np.median(dth_deg)) if dth_deg.size else None,
            "theta_err_deg_mean_aspect_ge_1.2": (
                float(dth_deg[ident].mean()) if ident.any() else None),
            "theta_err_deg_median_aspect_ge_1.2": (
                float(np.median(dth_deg[ident])) if ident.any() else None),
            "gt_frac_aspect_ge_1.2": float(ident.mean()) if aspect.size else None,
            "per_scene": per_scene,
        }
        os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(out, f, indent=2)
        os.replace(tmp, args.out)
        print(f"[chunk] epoch {epochs_done}/{args.epochs}:",
              json.dumps({k: out[k] for k in
                          ("mean_best_riou", "recall_riou_50",
                           "recall_riou_70")}), flush=True)
        return out

    steps_per_epoch = max(1, len(t.make_dataset("train")) // args.batch_size)

    def epochs_done():
        st = t.ckpt.latest_step() if t.ckpt else None
        return 0 if st is None else min(st // steps_per_epoch, args.epochs)

    val = t.make_dataset("val")
    train_s = 0.0
    if args.eval_only:
        t.cfg.stop_after_epochs = -1  # restore only, train nothing
        t.cfg.resume = True
        t.train_loop()
        out = evaluate(val, epochs_done(), train_s)
    else:
        while epochs_done() < args.epochs:
            t1 = time.time()
            t.train_loop()
            train_s += time.time() - t1
            t.cfg.resume = True  # subsequent chunks continue the run
            out = evaluate(val, epochs_done(), train_s)
    print("OBB E2E OK", json.dumps({k: out[k] for k in
          ("mean_best_riou", "recall_riou_50", "recall_riou_70")}), flush=True)


if __name__ == "__main__":
    main()
