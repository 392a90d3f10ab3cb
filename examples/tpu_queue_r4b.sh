#!/bin/bash
# Round-4 queue, part b (time-aware reorder): with ~3h of round budget
# left, the probes and the controlled quality A/B outrank the OBB
# 320-epoch continuation (its acceptance bar is already exceeded at 160
# epochs: recall@0.5riou = 0.909). The A/B writes partial rows per arm,
# so whatever lands before round end is evidence.
# Usage: nohup bash examples/tpu_queue_r4b.sh > /root/scratch/queue_r4b.log 2>&1 &
set -u
cd /root/repo
mkdir -p /root/scratch examples/results

echo "=== [1/3] probe14 packed-step decomposition $(date -u)"
timeout 900 python -u examples/probe14_packed_parts.py
echo "=== [1/3] exit=$? $(date -u)"

echo "=== [2/3] probe15 adaptive-K / dense-32 variants $(date -u)"
timeout 1500 python -u examples/probe15_adaptive_k.py
echo "=== [2/3] exit=$? $(date -u)"

echo "=== [3/3] packed-config quality A/B, 3 arms x shared scenes $(date -u)"
timeout 7800 python -u examples/fast_quality_multi.py \
    --out examples/results/fast_quality_abc.json \
    --num_scenes 6 --arms fast_packed,fast_unpacked,hash --holdout_views 2
echo "=== [3/3] exit=$? $(date -u)"
echo "=== queue_r4b done $(date -u)"
