#!/usr/bin/env bash
# Canonical NeRF-RCNN training config (parity with train_rcnn.sh:
# backbone grafted from the RPN ckpt and fine-tuned, 200 epochs,
# lr 1e-3 OneCycle, input rois).
set -xe
DATA_ROOT=${DATA_ROOT:-/path/to/dataset/root}

python -m instance_nerf_tpu.cli.run_rcnn \
  --mode train \
  --rpn_type fcos \
  --backbone_type vgg_EF \
  --dataset_root ${DATA_ROOT} \
  --dataset_split ${DATA_ROOT}/dataset_split.json \
  --rpn_ckpt ${RPN_CKPT:-./out/rpn} \
  --save_path ${SAVE_PATH:-./out/rcnn} \
  --num_epochs 200 \
  --lr 1e-3 \
  --weight_decay 1e-2 \
  --clip_grad_norm 0.1 \
  --log_interval 20 \
  --eval_interval 5 \
  --keep_checkpoints 2 \
  --log_to_file \
  --bbox_type aabb \
  --use_input_rois \
  --batch_size 4
