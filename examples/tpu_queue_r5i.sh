#!/bin/bash
# Round-5 TPU queue, stage F (continuation after the VM move wiped
# /root/scratch and .jax_cache — everything below restarts cold).
# Order = VERDICT-r4 priority: [1] pipeline re-cert (missing #2) with
# the instance-only-density projector; [2] OBB retrain from scratch
# (checkpoints lost; dataset regen is seeded) with the fixed rotated-IoU
# loss + canonicalized yaw eval; [3] probe26 fleet knee (weak #3);
# [4] probe27 RCNN parts (bonus). One TPU job at a time (CLAUDE.md).
# Usage: nohup bash examples/tpu_queue_r5i.sh > /root/scratch/queue_r5i.log 2>&1 &
set -u
cd /root/repo
mkdir -p /root/scratch examples/results

echo "=== [1/4] 5-stage pipeline e2e, instance-only projection $(date -u)"
timeout 4800 python -u examples/full_pipeline_synthetic.py \
    --workdir /root/scratch/pipe_r5d \
    --out examples/results/pipeline_e2e.json
echo "=== [1/4] exit=$? $(date -u)"

echo "=== [2/4] OBB regen + chunked retrain (fixed riou loss) $(date -u)"
timeout 7200 python -u examples/obb_end_to_end.py \
    --root /root/scratch/synobb --out examples/results/obb_e2e.json \
    --num_scenes 24 --resolution 128 --epochs 240 --chunk_epochs 40 \
    --batch_size 4
echo "=== [2/4] exit=$? $(date -u)"

echo "=== [3/4] probe26 fleet-scaling knee $(date -u)"
timeout 4500 python -u examples/probe26_fleet_knee.py
echo "=== [3/4] exit=$? $(date -u)"
cp /tmp/probe26.json examples/results/probe26_fleet_knee.json 2>/dev/null

echo "=== [4/4] probe27 RCNN parts $(date -u)"
timeout 4200 python -u examples/probe27_rcnn_parts.py
echo "=== [4/4] exit=$? $(date -u)"
cp /tmp/probe27.json examples/results/probe27_rcnn_parts.json 2>/dev/null
echo "=== queue r5i done $(date -u)"
