#!/bin/bash
# Round-5 TPU queue sketch (run stages individually if time is short).
# Every stage resumes and writes partial results atomically.
# Usage: nohup bash examples/tpu_queue_r5.sh > /root/scratch/queue_r5.log 2>&1 &
set -u
cd /root/repo
mkdir -p /root/scratch examples/results

echo "=== [1/4] OBB continuation to 320 epochs (currently at 200) $(date -u)"
timeout 5400 python -u examples/obb_end_to_end.py \
    --root /root/scratch/synobb \
    --out examples/results/obb_e2e.json \
    --num_scenes 24 --resolution 128 --epochs 320 --chunk_epochs 40 \
    --batch_size 4 --skip_gen --resume
echo "=== [1/4] exit=$? $(date -u)"

echo "=== [2/4] hash control on A/B scenes 1-3 (same seeds) $(date -u)"
timeout 7200 python -u examples/fast_quality_multi.py \
    --out examples/results/fast_quality_hash_ctl.json \
    --num_scenes 4 --arms hash --holdout_views 2
echo "=== [2/4] exit=$? $(date -u)"

echo "=== [3/4] bucket-fraction sweep (is 0.5/0.25/0.25 optimal?) $(date -u)"
# edit probe15 variants or pass configs; placeholder re-runs probe15
timeout 1500 python -u examples/probe15_adaptive_k.py
echo "=== [3/4] exit=$? $(date -u)"

echo "=== [4/4] detector step MFU after any kernel work $(date -u)"
timeout 1800 python -u bench.py
echo "=== [4/4] exit=$? $(date -u)"
echo "=== queue_r5 done $(date -u)"
