#!/bin/bash
# Round-3 TPU queue, stage 2 (run AFTER detector_benchmark finishes):
#   a) probe14 packed-step decomposition (fast, feeds BENCH_NOTES)
#   b) packed-config (T=2^15, L3F4) quality A/B vs the round-3 fast table
#   c) OBB tight-theta run with aux-L1 (resumable; 160 epochs this window)
# Usage: nohup bash examples/tpu_queue_r3b.sh > /root/scratch/queue_r3b.log 2>&1 &
set -u
cd /root/repo
mkdir -p /root/scratch examples/results

echo "=== [a] probe14 packed-step parts $(date -u)"
timeout 900 python -u examples/probe14_packed_parts.py
echo "=== [a] exit=$? $(date -u)"

echo "=== [b] packed-config quality A/B (T=2^15 L3F4, fast-only) $(date -u)"
timeout 1500 python -u examples/fast_quality_multi.py \
    --out examples/results/fast_quality_packed.json \
    --num_scenes 4 --skip_hash \
    --table_log2 15 --n_levels 3 --n_features 4
echo "=== [b] exit=$? $(date -u)"

echo "=== [c] OBB tight-theta (aux-L1), 160 epochs resumable $(date -u)"
timeout 3300 python -u examples/obb_end_to_end.py \
    --root /root/scratch/synobb \
    --out examples/results/obb_e2e.json \
    --num_scenes 24 --resolution 128 --epochs 160 --batch_size 4 --resume \
    $( [ -d /root/scratch/synobb/features ] && echo --skip_gen )
echo "=== [c] exit=$? $(date -u)"
echo "=== queue r3b done $(date -u)"
