#!/bin/bash
# Round-3 TPU queue (serialized: one chip, one client at a time).
# Roots live under /root/scratch — /tmp is wiped on VM restarts.
# Usage: nohup bash examples/tpu_queue_r3.sh > /root/scratch/queue_r3.log 2>&1 &
set -u
cd /root/repo
mkdir -p /root/scratch examples/results

echo "=== [1/2] RCNN retrain, corrected recipe (trainable backbone + OneCycle) $(date -u)"
timeout 2400 python -u examples/detector_benchmark.py \
    --root /root/scratch/synbench \
    --out examples/results/detector_synbench.json \
    --num_scenes 64 --resolution 160 --num_boxes 8 \
    --fcos_epochs 40 --rcnn_epochs 12 --batch_size 2 \
    --rcnn_remat --rcnn_steps_per_call 8 \
    $( [ -d /root/scratch/synbench/scene_0000 ] && echo --skip_gen )
echo "=== [1/2] exit=$? $(date -u)"

echo "=== [2/2] OBB tight-theta continuation (aux-L1 active) $(date -u)"
timeout 5400 python -u examples/obb_end_to_end.py \
    --root /root/scratch/synobb \
    --out examples/results/obb_e2e.json \
    --num_scenes 24 --resolution 128 --epochs 320 --batch_size 4 \
    $( [ -d /root/scratch/synobb/scene_0000 ] && echo --skip_gen )
echo "=== [2/2] exit=$? $(date -u)"
echo "=== queue done $(date -u)"
