#!/bin/bash
# Round-4c TPU queue: quality cover for the probe18 throughput leaders,
# hash controls, OBB 320-epoch continuation, final bench refresh.
# Every stage resumes / writes partial results atomically.
# Usage: nohup bash examples/tpu_queue_r4c.sh > /root/scratch/queue_r4c.log 2>&1 &
set -u
cd /root/repo
mkdir -p /root/scratch examples/results

echo "=== [1/4] quality A/B: new throughput configs vs bktB control $(date -u)"
timeout 10800 python -u examples/fast_quality_multi.py \
    --out examples/results/fast_quality_r4c.json \
    --num_scenes 5 --holdout_views 2 \
    --arms fast_packed_bktB,fast_bktB_bf16,fast_dense32_bktB_bf16,fast_bktB_S64
echo "=== [1/4] exit=$? $(date -u)"

echo "=== [2/4] hash control on A/B scenes 1-3 (same seeds) $(date -u)"
timeout 7200 python -u examples/fast_quality_multi.py \
    --out examples/results/fast_quality_hash_ctl.json \
    --num_scenes 4 --arms hash --holdout_views 2
echo "=== [2/4] exit=$? $(date -u)"

echo "=== [3/4] OBB continuation to 320 epochs (currently at 200) $(date -u)"
timeout 5400 python -u examples/obb_end_to_end.py \
    --root /root/scratch/synobb \
    --out examples/results/obb_e2e.json \
    --num_scenes 24 --resolution 128 --epochs 320 --chunk_epochs 40 \
    --batch_size 4 --skip_gen --resume
echo "=== [3/4] exit=$? $(date -u)"

echo "=== [4/4] bench refresh (scan-true field extras) $(date -u)"
timeout 2400 python -u bench.py
echo "=== [4/4] exit=$? $(date -u)"
echo "=== queue_r4c done $(date -u)"
