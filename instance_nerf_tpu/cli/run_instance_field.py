"""Instance-field CLI — the torch-ngp instance_nerf entry point
(README.md:55-65): per-scene NGP training, instance-field training from
matched 2D masks, novel-view rgb/instance rendering, and regular-grid
RGBσ feature extraction for the detector (stage-1 export).

Usage:
  # stage A: radiance field
  python -m instance_nerf_tpu.cli.run_instance_field --scene S --mode train \
      --steps 20000 --save_path OUT
  # stage B: instance field from matched masks
  python -m ... --mode train_instance --masks_dir S/masks_matched \
      --checkpoint OUT --save_path OUT
  # render novel views / extract detector features
  python -m ... --mode render --checkpoint OUT --save_path OUT/renders
  python -m ... --mode extract_features --checkpoint OUT \
      --resolution 160 --out_features features/scene.npz
"""
from __future__ import annotations

import argparse
import json
import os


def build_parser():
    p = argparse.ArgumentParser("run_instance_field")
    p.add_argument("--mode", default="train",
                   choices=["train", "train_instance", "render",
                            "extract_features", "benchmark"])
    p.add_argument("--scene", default="", help="scene root with transforms.json")
    p.add_argument("--transforms", default="transforms.json")
    p.add_argument("--masks_dir", default="", help="matched 2D instance masks (.npy per view)")
    p.add_argument("--save_path", default="")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--steps", type=int, default=20000)
    p.add_argument("--downscale", type=int, default=1)
    p.add_argument("--n_rays", type=int, default=4096)
    p.add_argument("--n_samples", type=int, default=128)
    p.add_argument("--k_occupied", type=int, default=32,
                   help="fixed-K occupancy compaction (0 = query all samples)")
    p.add_argument("--k_buckets", default="",
                   help="adaptive-K routing, 'frac:K,frac:K,...' e.g. "
                        "'0.5:8,0.25:16,0.25:32' — rays sorted by "
                        "occupancy hits, emptiest fraction gets the "
                        "smallest K (render.py:render_rays); or 'auto' "
                        "to choose the fractions from the measured "
                        "per-ray hit histogram after a short warmup "
                        "(render.py:choose_k_buckets — the best-quality "
                        "arm in fast_quality_r5.json)")
    p.add_argument("--occ_coarse_res", type=int, default=0,
                   help="two-stage occupancy: coarse MXU selection at "
                        "this res + fine mask on the K compacted "
                        "samples (0 = single-stage)")
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--preset", default="", choices=["", "tpu_fast"],
                   help="tpu_fast: the quality-validated shipping "
                        "recipe — packed T=2^15 tables, 2 levels x 6 "
                        "features, coarse-MXU occupancy, adaptive-K "
                        "buckets 0.625:2/0.25:4/0.125:8 over 32 "
                        "stratified candidates, 12288 rays/step "
                        "(2.14M rgb / 2.51M instance rays/s on v5e; "
                        "fast_quality_r5.json quality gate). Explicit "
                        "flags still override.")
    p.add_argument("--encoding", default="hash", choices=["hash", "fast"],
                   help="'hash' = reference-parity shared-corner NGP; "
                        "'fast' = TPU-native brick-grid (fast_encode.py)")
    p.add_argument("--n_levels", type=int, default=16)
    p.add_argument("--log2_table_size", type=int, default=19)
    p.add_argument("--max_res", type=int, default=1024)
    p.add_argument("--num_instances", type=int, default=33)
    p.add_argument("--occ_res", type=int, default=128)
    p.add_argument("--resolution", type=int, default=160,
                   help="feature-grid resolution for extract_features")
    p.add_argument("--out_features", default="")
    p.add_argument("--log_every", type=int, default=100)
    p.add_argument("--steps_per_call", type=int, default=0,
                   help="updates per device dispatch (0 = occ cadence)")
    p.add_argument("--seed", type=int, default=0)
    return p


def parse_with_provenance(argv=None):
    """Parse argv and record WHICH flags the user actually typed
    (args.provided_flags), so presets can fill everything else — even a
    flag explicitly set to its default value."""
    args = build_parser().parse_args(argv)
    sentinel = build_parser()
    for action in sentinel._actions:
        action.default = argparse.SUPPRESS
    args.provided_flags = sorted(vars(sentinel.parse_args(argv)))
    return args


PRESETS = {
    # quality gate: fast_quality_r5.json; perf: probe23/probe23b
    "tpu_fast": dict(encoding="fast", n_rays=12288, n_samples=32,
                     k_occupied=16, occ_coarse_res=32,
                     k_buckets="0.625:2,0.25:4,0.125:8"),
}


def make_trainer(args):
    from instance_nerf_tpu.train.ngp_trainer import (
        InstanceFieldTrainer,
        NGPConfig,
        fast_ngp_config,
    )

    if args.preset:
        parser = build_parser()
        provided = set(getattr(args, "provided_flags", ()))
        for flag, val in PRESETS[args.preset].items():
            # fill every flag the user didn't type; when provenance is
            # unavailable (make_trainer called on a bare namespace),
            # fall back to treating default-valued flags as unset
            user_set = (flag in provided if provided
                        else getattr(args, flag) != parser.get_default(flag))
            if not user_set:
                setattr(args, flag, val)

    if args.k_buckets == "auto":
        # start on the shipping bktE ladder; train mode re-chooses the
        # fractions from the measured hit histogram after warmup
        # (choose_k_buckets) and swaps via set_sampling
        k_buckets = ((0.625, 2), (0.25, 4), (0.125, 8))
    elif args.k_buckets:
        k_buckets = tuple(
            (float(f), int(k)) for f, k in
            (pair.split(":") for pair in args.k_buckets.split(",")))
    else:
        k_buckets = None
    common = dict(
        max_res=args.max_res,
        num_instances=args.num_instances,
        n_rays=args.n_rays,
        n_samples=args.n_samples,
        lr=args.lr,
        occ_res=args.occ_res,
        k_occupied=args.k_occupied or None,
        occ_coarse_res=args.occ_coarse_res or None,
        k_buckets=k_buckets,
    )
    if args.encoding == "fast":
        if args.preset == "tpu_fast":
            # packed tables (probe23/23b: T=2^15, 2 levels x 6 features,
            # per-ray stratified jitter — the fast_quality_r5 ship arm)
            cfg = fast_ngp_config(table_size=2 ** 15, n_levels=2,
                                  n_features=6, ray_jitter=True,
                                  **common)
        else:
            cfg = fast_ngp_config(**common)
    else:
        cfg = NGPConfig(
            n_levels=args.n_levels,
            table_size=2 ** args.log2_table_size,
            **common,
        )
    return InstanceFieldTrainer(cfg, seed=args.seed)


def save_state(trainer, path, args, metrics=None):
    from instance_nerf_tpu.train.checkpoints import CheckpointManager

    mgr = CheckpointManager(path, keep=2)
    state = {"params": trainer.params, "occ_grid": trainer.occ.grid}
    mgr.save(0, state, config=vars(args), metrics=metrics or {})


def load_state(trainer, path):
    from instance_nerf_tpu.train.checkpoints import CheckpointManager
    from instance_nerf_tpu.models.render import OccupancyGrid

    mgr = CheckpointManager(path)
    tmpl = {"params": trainer.params, "occ_grid": trainer.occ.grid}
    state, meta = mgr.restore(tmpl)
    trainer.params = state["params"]
    trainer.occ = OccupancyGrid(state["occ_grid"], trainer.occ.threshold)
    return meta


def main(argv=None):
    args = parse_with_provenance(argv)
    from instance_nerf_tpu.data.nerf_dataset import load_nerf_scene

    trainer = make_trainer(args)
    if args.checkpoint:
        load_state(trainer, args.checkpoint)

    if args.mode in ("train", "train_instance"):
        scene = load_nerf_scene(
            args.scene, args.transforms,
            masks_dir=args.masks_dir or None,
            downscale=args.downscale,
        )
        stage = "rgb" if args.mode == "train" else "instance"
        steps = args.steps
        extra = {}
        if args.k_buckets == "auto" and stage == "rgb":
            from instance_nerf_tpu.models.render import choose_k_buckets

            warm = min(160, steps // 4)
            if warm:
                trainer.train(scene, warm, stage="rgb", log_every=0,
                              steps_per_call=args.steps_per_call or None)
            ladder = choose_k_buckets(trainer.measure_hits(scene))
            trainer.set_sampling(k_buckets=ladder)
            steps -= warm
            extra["k_buckets_auto"] = ",".join(
                f"{f}:{k}" for f, k in ladder)
        metrics = trainer.train(scene, steps, stage=stage,
                                log_every=args.log_every,
                                steps_per_call=args.steps_per_call or None)
        metrics.update(extra)
        print(json.dumps(metrics))
        if args.save_path:
            save_state(trainer, args.save_path, args, metrics)

    elif args.mode == "render":
        scene = load_nerf_scene(args.scene, args.transforms,
                                downscale=args.downscale)
        os.makedirs(args.save_path, exist_ok=True)
        import numpy as np
        from PIL import Image

        for v in range(scene.num_views):
            out = trainer.render_image(scene.poses[v], scene.intrinsics, scene.hw)
            Image.fromarray(
                (np.clip(out["rgb"], 0, 1) * 255).astype(np.uint8)
            ).save(os.path.join(args.save_path, f"rgb_{v:03d}.png"))
            np.save(os.path.join(args.save_path, f"instance_{v:03d}.npy"),
                    out["instance"])
        print(json.dumps({"rendered": scene.num_views, "out": args.save_path}))

    elif args.mode == "benchmark":
        r = trainer.benchmark_train(reps=20, stage="instance")
        print(json.dumps({
            "encoding": args.encoding,
            "rays_per_s": round(r["rays_per_s"]),
            "step_ms": round(r["step_ms"], 2),
            "n_rays": trainer.cfg.n_rays,
            "k_occupied": trainer.cfg.k_occupied,
        }))

    elif args.mode == "extract_features":
        import numpy as np

        grid = trainer.extract_rgbsigma(args.resolution)
        out = args.out_features or os.path.join(args.save_path, "features.npz")
        os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
        np.savez_compressed(
            out, rgbsigma=grid.astype(np.float32),
            resolution=np.asarray(grid.shape[:3]),
        )
        print(json.dumps({"features": out, "shape": list(grid.shape)}))


if __name__ == "__main__":
    main()
