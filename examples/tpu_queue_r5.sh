#!/bin/bash
# Round-5 TPU queue, stage 1 (serialized: one chip, one client at a time).
# Every stage writes partial results atomically, so a tunnel stall or
# timeout costs at most one unit (CLAUDE.md).
# Usage: nohup bash examples/tpu_queue_r5.sh > /root/scratch/queue_r5.log 2>&1 &
set -u
cd /root/repo
mkdir -p /root/scratch examples/results

echo "=== [1/3] probe23 rgb-stage endgame $(date -u)"
timeout 3600 python -u examples/probe23_rgb_endgame.py
echo "=== [1/3] exit=$? $(date -u)"
cp /tmp/probe23.json examples/results/probe23_rgb_endgame.json 2>/dev/null

echo "=== [2/3] probe24 FCOS train-step decomposition $(date -u)"
timeout 3600 python -u examples/probe24_fcos_parts.py
echo "=== [2/3] exit=$? $(date -u)"
cp /tmp/probe24.json examples/results/probe24_fcos_parts.json 2>/dev/null

echo "=== [3/3] OBB re-eval with canonicalized theta metric $(date -u)"
timeout 2700 python -u examples/obb_end_to_end.py \
    --root /root/scratch/synobb \
    --out examples/results/obb_e2e.json \
    --num_scenes 24 --resolution 128 --epochs 320 --batch_size 4 \
    --skip_gen --eval_only
echo "=== [3/3] exit=$? $(date -u)"
echo "=== queue r5 stage1 done $(date -u)"
