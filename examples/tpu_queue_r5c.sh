#!/bin/bash
# Round-5 TPU queue, stage 3. Run AFTER tpu_queue_r5b.sh finishes.
# Usage: nohup bash examples/tpu_queue_r5c.sh > /root/scratch/queue_r5c.log 2>&1 &
set -u
cd /root/repo
mkdir -p /root/scratch examples/results

echo "=== [1/3] probe24 FCOS parts, honest (DCE holes closed) $(date -u)"
timeout 3600 python -u examples/probe24_fcos_parts.py
echo "=== [1/3] exit=$? $(date -u)"
cp /tmp/probe24.json examples/results/probe24_fcos_parts.json 2>/dev/null

echo "=== [2/3] OBB re-eval, canonicalized theta (2h budget) $(date -u)"
timeout 7200 python -u examples/obb_end_to_end.py \
    --root /root/scratch/synobb --out examples/results/obb_e2e.json \
    --num_scenes 24 --resolution 128 --epochs 320 --batch_size 4 \
    --skip_gen --eval_only
echo "=== [2/3] exit=$? $(date -u)"

echo "=== [3/3] bench.py preview (BENCH_r05 dry run) $(date -u)"
timeout 5400 python -u bench.py | tee /root/scratch/bench_r5_preview.json
echo "=== [3/3] exit=$? $(date -u)"
echo "=== queue r5 stage3 done $(date -u)"
