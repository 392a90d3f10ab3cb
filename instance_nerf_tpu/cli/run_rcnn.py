"""NeRF-RCNN CLI — train / eval / benchmark / check_arch
(ref surface: run_rcnn.py; canonical configs train_rcnn.sh, inference.sh).
"""
from __future__ import annotations

import argparse
import json
import logging
import os
import sys


def build_parser():
    p = argparse.ArgumentParser("run_rcnn")
    p.add_argument("--mode", default="train",
                   choices=["train", "eval", "benchmark", "check_arch"])
    p.add_argument("--dataset_root", default="")
    p.add_argument("--dataset_split", default="")
    p.add_argument("--save_path", default="")
    p.add_argument("--rpn_ckpt", default="", help="RPN checkpoint; its backbone is grafted then fine-tuned (frozen only with --freeze_backbone)")
    p.add_argument("--rcnn_ckpt", default="")
    p.add_argument("--rpn_type", choices=["anchor", "fcos"], default="fcos")
    p.add_argument("--backbone_type", default="vgg_EF")
    p.add_argument("--resolution", type=int, default=160)
    p.add_argument("--num_classes", type=int, default=11)
    p.add_argument("--bbox_type", choices=["aabb", "obb"], default="aabb")
    p.add_argument("--use_input_rois", action="store_true", default=True)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--num_epochs", type=int, default=200)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--weight_decay", type=float, default=1e-2)
    p.add_argument("--clip_grad_norm", type=float, default=0.1)
    p.add_argument("--log_interval", type=int, default=20)
    p.add_argument("--log_to_file", action="store_true")
    p.add_argument("--eval_interval", type=int, default=5)
    p.add_argument("--keep_checkpoints", type=int, default=2)
    # mirrors the reference CLI (run_rcnn.py:59): off by default — the
    # canonical recipe (train_rcnn.sh) trains the backbone
    p.add_argument("--freeze_backbone", action="store_true")
    p.add_argument("--rpn_batch_size_per_mesh", type=int, default=256)
    p.add_argument("--batch_size_per_image", type=int, default=512)
    p.add_argument("--positive_fraction", type=float, default=0.25)
    p.add_argument("--box_fg_iou_thresh", type=float, default=0.25)
    p.add_argument("--box_bg_iou_thresh", type=float, default=0.25)
    p.add_argument("--RCNN_box_score_thresh", type=float, default=0.0)
    p.add_argument("--RCNN_box_nms_thresh", type=float, default=0.15)
    p.add_argument("--RCNN_detections_per_img", type=int, default=25)
    p.add_argument("--max_rois", type=int, default=256)
    p.add_argument("--eval_rois", type=int, default=20)
    p.add_argument("--max_gt", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--steps_per_call", type=int, default=1,
                   help="updates per device dispatch (lax.scan)")
    return p


def config_from_args(args):
    from instance_nerf_tpu.train.rcnn_trainer import RCNNConfig

    return RCNNConfig(
        dataset_root=args.dataset_root,
        dataset_split=args.dataset_split,
        save_path=args.save_path,
        rpn_ckpt=args.rpn_ckpt,
        rcnn_ckpt=args.rcnn_ckpt,
        backbone_type=args.backbone_type,
        resolution=args.resolution,
        num_classes=args.num_classes,
        bbox_type=args.bbox_type,
        batch_size=args.batch_size,
        num_epochs=args.num_epochs,
        lr=args.lr,
        weight_decay=args.weight_decay,
        clip_grad_norm=args.clip_grad_norm,
        log_interval=args.log_interval,
        eval_interval=args.eval_interval,
        keep_checkpoints=args.keep_checkpoints,
        steps_per_call=args.steps_per_call,
        freeze_backbone=args.freeze_backbone,
        batch_size_per_image=args.batch_size_per_image,
        positive_fraction=args.positive_fraction,
        fg_iou_thresh=args.box_fg_iou_thresh,
        bg_iou_thresh=args.box_bg_iou_thresh,
        box_score_thresh=args.RCNN_box_score_thresh,
        box_nms_thresh=args.RCNN_box_nms_thresh,
        detections_per_img=args.RCNN_detections_per_img,
        max_rois=args.max_rois,
        eval_rois=args.eval_rois,
        max_gt=args.max_gt,
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

    from instance_nerf_tpu.data.datasets import SegmentationDataset
    from instance_nerf_tpu.train.rcnn_trainer import RCNNTrainer

    trainer = RCNNTrainer(config_from_args(args))
    if args.mode == "train":
        trainer.train_loop()
    elif args.mode == "eval":
        trainer.init_state()
        ds = SegmentationDataset("val", args.dataset_root, args.dataset_split or None)
        metrics = trainer.eval(
            ds,
            save_masks_path=os.path.join(args.save_path, "masks") if args.save_path else None,
        )
        print(json.dumps(metrics, indent=2))
        if args.save_path:
            os.makedirs(args.save_path, exist_ok=True)
            with open(os.path.join(args.save_path, "eval.json"), "w") as f:
                json.dump(metrics, f, indent=2)
    elif args.mode == "benchmark":
        print(json.dumps(trainer.benchmark(
            reps=20, shape=(args.resolution,) * 2 + (args.resolution * 13 // 16,)
        )))
    elif args.mode == "check_arch":
        print(json.dumps(trainer.check_arch(min(args.resolution, 64))))


if __name__ == "__main__":
    main()
