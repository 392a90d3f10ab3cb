"""Anchor-RPN CLI — train / eval / benchmark (ref surface: run_rpn.py).

``--mode eval --save_results`` exports per-scene proposals + FPN level
features — the bridge that builds the RCNN dataset's ``rois/``
(run_rpn.py:485-505).
"""
from __future__ import annotations

import argparse
import json
import logging
import os
import sys


def build_parser():
    p = argparse.ArgumentParser("run_rpn")
    p.add_argument("--mode", default="train", choices=["train", "eval", "benchmark"])
    p.add_argument("--features_path", default="")
    p.add_argument("--boxes_path", default="")
    p.add_argument("--dataset_split", default="")
    p.add_argument("--save_path", default="")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--backbone_type", default="vgg_EF")
    p.add_argument("--resolution", type=int, default=160)
    p.add_argument("--normalize_density", action="store_true", default=True)
    p.add_argument("--rotated_bbox", action="store_true")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--num_epochs", type=int, default=160)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--weight_decay", type=float, default=1e-3)
    p.add_argument("--clip_grad_norm", type=float, default=0.1)
    p.add_argument("--log_interval", type=int, default=30)
    p.add_argument("--log_to_file", action="store_true")
    p.add_argument("--eval_interval", type=int, default=4)
    p.add_argument("--keep_checkpoints", type=int, default=2)
    p.add_argument("--rotate_prob", type=float, default=0.5)
    p.add_argument("--flip_prob", type=float, default=0.5)
    p.add_argument("--rot_scale_prob", type=float, default=0.0)
    p.add_argument("--rpn_head_conv_depth", type=int, default=4)
    p.add_argument("--rpn_pre_nms_top_n", type=int, default=1000)
    p.add_argument("--rpn_post_nms_top_n", type=int, default=1000)
    p.add_argument("--rpn_nms_thresh", type=float, default=0.7)
    p.add_argument("--rpn_score_thresh", type=float, default=0.0)
    p.add_argument("--reg_loss_type", default="smooth_l1",
                   choices=["smooth_l1", "iou", "linear_iou", "giou", "diou"])
    p.add_argument("--proj2d_loss_weight", type=float, default=1.0)
    p.add_argument("--batch_size_per_mesh", type=int, default=256)
    p.add_argument("--save_results", action="store_true")
    p.add_argument("--output_proposals", action="store_true")
    p.add_argument("--filter", choices=["none", "tp", "fp"], default="none")
    p.add_argument("--filter_threshold", type=float, default=0.7)
    p.add_argument("--output_voxel_scores", action="store_true")
    p.add_argument("--max_gt", type=int, default=64)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    return p


def config_from_args(args):
    from instance_nerf_tpu.train.rpn_trainer import RPNConfig

    return RPNConfig(
        features_path=args.features_path,
        boxes_path=args.boxes_path,
        dataset_split=args.dataset_split,
        save_path=args.save_path,
        checkpoint=args.checkpoint,
        backbone_type=args.backbone_type,
        resolution=args.resolution,
        normalize_density=args.normalize_density,
        rotated_bbox=args.rotated_bbox,
        batch_size=args.batch_size,
        num_epochs=args.num_epochs,
        lr=args.lr,
        weight_decay=args.weight_decay,
        clip_grad_norm=args.clip_grad_norm,
        log_interval=args.log_interval,
        eval_interval=args.eval_interval,
        keep_checkpoints=args.keep_checkpoints,
        conv_depth=args.rpn_head_conv_depth,
        pre_nms_top_n=args.rpn_pre_nms_top_n,
        post_nms_top_n=args.rpn_post_nms_top_n,
        nms_thresh=args.rpn_nms_thresh,
        score_thresh=args.rpn_score_thresh,
        reg_loss_type=args.reg_loss_type,
        proj2d_loss_weight=args.proj2d_loss_weight,
        batch_size_per_mesh=args.batch_size_per_mesh,
        flip_prob=args.flip_prob,
        rotate_prob=args.rotate_prob,
        rot_scale_prob=args.rot_scale_prob,
        max_gt=args.max_gt,
        resume=args.resume,
        seed=args.seed,
    )


def main(argv=None):
    args = build_parser().parse_args(argv)
    handlers = [logging.StreamHandler(sys.stdout)]
    if args.log_to_file and args.save_path:
        os.makedirs(args.save_path, exist_ok=True)
        handlers.append(logging.FileHandler(os.path.join(args.save_path, "train.log")))
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(levelname)s %(message)s",
                        handlers=handlers)

    from instance_nerf_tpu.train.rpn_trainer import RPNTrainer

    trainer = RPNTrainer(config_from_args(args))
    if args.mode == "train":
        trainer.train_loop()
    elif args.mode == "eval":
        trainer.init_state()
        ds = trainer.make_dataset("test" if args.dataset_split else "val")
        metrics = trainer.eval(
            ds,
            save_results_path=args.save_path if args.save_results else None,
            output_proposals=args.output_proposals,
            filter_mode=args.filter,
            filter_threshold=args.filter_threshold,
            output_voxel_scores=args.output_voxel_scores,
        )
        print(json.dumps(metrics, indent=2))
        if args.save_path:
            os.makedirs(args.save_path, exist_ok=True)
            with open(os.path.join(args.save_path, "eval.json"), "w") as f:
                json.dump(metrics, f, indent=2)
    elif args.mode == "benchmark":
        print(json.dumps(trainer.benchmark(
            reps=20, shape=(args.resolution, args.resolution,
                            args.resolution * 13 // 20)
        )))


if __name__ == "__main__":
    main()
