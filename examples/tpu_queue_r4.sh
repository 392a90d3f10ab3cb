#!/bin/bash
# Round-4 TPU queue (serialized: one chip, one client at a time).
# Every stage is resumable and writes partial results per chunk, so a
# timeout costs at most one chunk (VERDICT r3 weak #1/#4).
# Usage: nohup bash examples/tpu_queue_r4.sh > /root/scratch/queue_r4.log 2>&1 &
set -u
cd /root/repo
mkdir -p /root/scratch examples/results

echo "=== [1/5] OBB eval of the landed 160-epoch ckpt (step_640) $(date -u)"
timeout 2700 python -u examples/obb_end_to_end.py \
    --root /root/scratch/synobb \
    --out examples/results/obb_e2e.json \
    --num_scenes 24 --resolution 128 --epochs 160 --batch_size 4 \
    --skip_gen --eval_only
echo "=== [1/5] exit=$? $(date -u)"

echo "=== [2/5] RCNN retrain, corrected recipe + fixed mask-target HBM $(date -u)"
timeout 6000 python -u examples/detector_benchmark.py \
    --root /root/scratch/synbench \
    --out examples/results/detector_synbench.json \
    --num_scenes 64 --resolution 160 --num_boxes 8 \
    --fcos_epochs 40 --rcnn_epochs 12 --batch_size 2 \
    --rcnn_remat --rcnn_steps_per_call 8 \
    --skip_gen --skip_fcos --resume
echo "=== [2/5] exit=$? $(date -u)"

echo "=== [3/5] OBB continuation 160 -> 320 epochs, 40-epoch chunks $(date -u)"
timeout 7200 python -u examples/obb_end_to_end.py \
    --root /root/scratch/synobb \
    --out examples/results/obb_e2e.json \
    --num_scenes 24 --resolution 128 --epochs 320 --chunk_epochs 40 \
    --batch_size 4 --skip_gen --resume
echo "=== [3/5] exit=$? $(date -u)"

echo "=== [4/5] probe14 packed-step decomposition $(date -u)"
timeout 900 python -u examples/probe14_packed_parts.py
echo "=== [4/5] exit=$? $(date -u)"

echo "=== [5/5] packed-config quality A/B, 3 arms x 6 shared scenes $(date -u)"
timeout 16200 python -u examples/fast_quality_multi.py \
    --out examples/results/fast_quality_abc.json \
    --num_scenes 6 --arms fast_packed,fast_unpacked,hash --holdout_views 2
echo "=== [5/5] exit=$? $(date -u)"
echo "=== queue_r4 done $(date -u)"
