#!/bin/bash
# Round-5 TPU queue, stage 2. Run AFTER tpu_queue_r5.sh finishes.
# Usage: nohup bash examples/tpu_queue_r5b.sh > /root/scratch/queue_r5b.log 2>&1 &
set -u
cd /root/repo
mkdir -p /root/scratch examples/results

echo "=== [1/4] probe23b S=32 candidates $(date -u)"
timeout 3600 python -u examples/probe23b_s32.py
echo "=== [1/4] exit=$? $(date -u)"
cp /tmp/probe23b.json examples/results/probe23b_s32.json 2>/dev/null

echo "=== [2/4] device-bound fleet scaling B=8..64 $(date -u)"
timeout 3600 python -u examples/multiscene_bench.py \
    --sweep 8,16,32,64 --device_data --rays 512 --spc 32 --steps 128 \
    --out examples/results/multiscene_sweep_tpu.json
echo "=== [2/4] exit=$? $(date -u)"

echo "=== [3/4] quality arms: anneal / autoK / bktE / L2F6 / S32 $(date -u)"
timeout 10800 python -u examples/fast_quality_multi.py \
    --num_scenes 6 --holdout_views 2 \
    --arms fast_bktC_S48_anneal,fast_autoK_S48,fast_bktE_S48,fast_L2F6_bktE_S48,fast_L2F6_bktE_S32 \
    --out examples/results/fast_quality_r5.json
echo "=== [3/4] exit=$? $(date -u)"

echo "=== [4/4] 5-stage pipeline e2e at shipping configs $(date -u)"
timeout 5400 python -u examples/full_pipeline_synthetic.py \
    --workdir /root/scratch/pipe_r5 \
    --out examples/results/pipeline_e2e.json
echo "=== [4/4] exit=$? $(date -u)"
echo "=== queue r5 stage2 done $(date -u)"
