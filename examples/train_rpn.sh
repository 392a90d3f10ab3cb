#!/usr/bin/env bash
# Canonical FCOS-RPN training config (parity with the reference's
# train_rpn.sh: vgg_EF @ 160^3, 160 epochs, lr 3e-4, bs 4).
set -xe
DATA_ROOT=${DATA_ROOT:-/path/to/dataset/root}

python -m instance_nerf_tpu.cli.run_fcos \
  --mode train \
  --resolution 160 \
  --backbone_type vgg_EF \
  --features_path ${DATA_ROOT}/features \
  --boxes_path ${DATA_ROOT}/metadata \
  --dataset_split ${DATA_ROOT}/dataset_split.json \
  --save_path ${SAVE_PATH:-./out/rpn} \
  --num_epochs 160 \
  --lr 3e-4 \
  --weight_decay 1e-3 \
  --clip_grad_norm 0.1 \
  --log_interval 30 \
  --eval_interval 4 \
  --keep_checkpoints 2 \
  --norm_reg_targets \
  --centerness_on_reg \
  --center_sampling_radius 1.5 \
  --iou_loss_type iou \
  --rot_scale_prob 0.0 \
  --log_to_file \
  --nms_thresh 0.3 \
  --batch_size 4 \
  --normalize_density
