"""FCOS-RPN CLI — train / eval / benchmark (ref surface: run_fcos.py).

Usage:
  python -m instance_nerf_tpu.cli.run_fcos --mode train \
      --features_path D/features --boxes_path D/metadata \
      --dataset_split D/dataset_split.json --save_path OUT \
      --backbone_type vgg_EF --resolution 160 ...
"""
from __future__ import annotations

import argparse
import json
import logging
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("run_fcos")
    p.add_argument("--mode", default="train", choices=["train", "eval", "benchmark"])
    p.add_argument("--features_path", default="")
    p.add_argument("--boxes_path", default="")
    p.add_argument("--dataset_split", default="")
    p.add_argument("--save_path", default="")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--backbone_type", default="vgg_EF")
    p.add_argument("--input_dim", type=int, default=4)
    p.add_argument("--rotated_bbox", action="store_true")
    p.add_argument("--resolution", type=int, default=160)
    p.add_argument("--normalize_density", action="store_true")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--num_epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--reg_loss_weight", type=float, default=1.0)
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--clip_grad_norm", type=float, default=0.1)
    p.add_argument("--log_interval", type=int, default=20)
    p.add_argument("--log_to_file", action="store_true")
    p.add_argument("--eval_interval", type=int, default=1)
    p.add_argument("--keep_checkpoints", type=int, default=1)
    p.add_argument("--rotate_prob", type=float, default=0.5)
    p.add_argument("--flip_prob", type=float, default=0.5)
    p.add_argument("--rot_scale_prob", type=float, default=0.5)
    p.add_argument("--num_convs", type=int, default=4)
    p.add_argument("--norm_reg_targets", action="store_true", default=True)
    p.add_argument("--centerness_on_reg", action="store_true", default=True)
    p.add_argument("--center_sampling_radius", type=float, default=1.5)
    p.add_argument("--iou_loss_type", default="iou",
                   choices=["iou", "linear_iou", "giou", "diou", "smooth_l1"])
    p.add_argument("--use_additional_l1_loss", action="store_true")
    p.add_argument("--proj2d_loss_weight", type=float, default=0.0,
                   help="2D corner-projection aux loss for OBB "
                        "(ref run_fcos.py:111; voxel-scale decode)")
    p.add_argument("--steps_per_call", type=int, default=1,
                   help="updates per device dispatch (lax.scan)")
    p.add_argument("--conv_at_start", action="store_true")
    p.add_argument("--pre_nms_top_n", type=int, default=2500)
    p.add_argument("--fpn_post_nms_top_n", type=int, default=2500)
    p.add_argument("--nms_thresh", type=float, default=0.3)
    p.add_argument("--pre_nms_thresh", type=float, default=0.0)
    p.add_argument("--min_size", type=float, default=0.0)
    p.add_argument("--ap_top_n", type=int, default=None)
    p.add_argument("--save_results", action="store_true")
    p.add_argument("--output_voxel_scores", action="store_true")
    p.add_argument("--filter", choices=["none", "tp", "fp"], default="none")
    p.add_argument("--filter_threshold", type=float, default=0.7)
    p.add_argument("--n_spatial", type=int, default=1,
                   help="spatial (sp) mesh axis size; data axis uses the rest")
    p.add_argument("--max_gt", type=int, default=64)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    return p


def config_from_args(args) -> "FCOSConfig":
    from instance_nerf_tpu.train.fcos_trainer import FCOSConfig

    keys = FCOSConfig.__dataclass_fields__.keys()
    return FCOSConfig(**{k: v for k, v in vars(args).items() if k in keys})


def main(argv=None):
    args = build_parser().parse_args(argv)
    handlers = [logging.StreamHandler(sys.stdout)]
    if args.log_to_file and args.save_path:
        os.makedirs(args.save_path, exist_ok=True)
        handlers.append(
            logging.FileHandler(os.path.join(args.save_path, "train.log"))
        )
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
        handlers=handlers,
    )

    from instance_nerf_tpu.train.fcos_trainer import FCOSTrainer

    trainer = FCOSTrainer(config_from_args(args))
    if args.mode == "train":
        trainer.train_loop()
    elif args.mode == "eval":
        trainer.init_state()
        ds = trainer.make_dataset("test" if args.dataset_split else "val")
        metrics = trainer.eval(
            ds, save_results_path=args.save_path if (args.save_results or args.output_voxel_scores) else None,
            output_voxel_scores=args.output_voxel_scores,
            filter_mode=args.filter, filter_threshold=args.filter_threshold
        )
        print(json.dumps(metrics, indent=2))
        if args.save_path:
            os.makedirs(args.save_path, exist_ok=True)
            with open(os.path.join(args.save_path, "eval.json"), "w") as f:
                json.dump(metrics, f, indent=2)
    elif args.mode == "benchmark":
        res = trainer.benchmark(
            reps=50, shape=(args.resolution,) * 3
        )
        print(json.dumps(res))


if __name__ == "__main__":
    main()
