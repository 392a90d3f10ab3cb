#!/usr/bin/env bash
# Full detector inference -> discrete 3D instance masks npz per scene
# (parity with inference.sh).
set -xe
DATA_ROOT=${DATA_ROOT:-/path/to/dataset/root}

python -m instance_nerf_tpu.cli.run_rcnn \
  --mode eval \
  --rpn_type fcos \
  --backbone_type vgg_EF \
  --dataset_root ${DATA_ROOT} \
  --dataset_split ${DATA_ROOT}/dataset_split.json \
  --save_path ${SAVE_PATH:-./out/inference} \
  --rcnn_ckpt ${RCNN_CKPT:-./out/rcnn} \
  --RCNN_box_nms_thresh 0.15 \
  --RCNN_box_score_thresh 0.0 \
  --bbox_type aabb \
  --use_input_rois \
  --batch_size 4
