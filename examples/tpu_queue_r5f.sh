#!/bin/bash
# Round-5 TPU queue, stage C: the OBB retrain (dataset + checkpoint were
# lost in the VM move; regen is seeded/deterministic). Run AFTER
# tpu_queue_r5e.sh. The eval now canonicalizes yaw under the box
# symmetry group (w,l,th)->(l,w,th+90deg) — the round-4 20-58 deg
# theta errors were measured WITHOUT this fold, so a representation
# swap on a box-identical prediction counted as ~90 deg (VERDICT r4
# weak #4). Chunked + resumable: each 40-epoch chunk writes the eval
# atomically.
# Usage: nohup bash examples/tpu_queue_r5f.sh > /root/scratch/queue_r5f.log 2>&1 &
set -u
cd /root/repo
mkdir -p /root/scratch examples/results

echo "=== [1/1] OBB regen + chunked retrain (canonicalized yaw eval) $(date -u)"
timeout 10800 python -u examples/obb_end_to_end.py \
    --root /root/scratch/synobb --out examples/results/obb_e2e.json \
    --num_scenes 24 --resolution 128 --epochs 240 --chunk_epochs 40 \
    --batch_size 4
echo "=== [1/1] exit=$? $(date -u)"
echo "=== queue r5f done $(date -u)"
