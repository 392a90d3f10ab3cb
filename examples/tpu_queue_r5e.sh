#!/bin/bash
# Round-5 TPU queue, stage B. Run AFTER tpu_queue_r5d.sh finishes.
# Order: timing-sensitive probes first (quiet host), then the pipeline
# re-cert, then the resumable chunked OBB retrain (dataset + checkpoint
# were lost in the VM move; data regen is seeded/deterministic).
# Usage: nohup bash examples/tpu_queue_r5e.sh > /root/scratch/queue_r5e.log 2>&1 &
set -u
cd /root/repo
mkdir -p /root/scratch examples/results

echo "=== [1/4] probe24 FCOS parts, honest (DCE holes closed) $(date -u)"
timeout 4500 python -u examples/probe24_fcos_parts.py
echo "=== [1/4] exit=$? $(date -u)"
cp /tmp/probe24.json examples/results/probe24_fcos_parts.json 2>/dev/null

echo "=== [2/4] device-bound fleet scaling B=8..64 $(date -u)"
timeout 4500 python -u examples/multiscene_bench.py \
    --sweep 8,16,32,64 --device_data --rays 512 --spc 32 --steps 128 \
    --out examples/results/multiscene_sweep_tpu.json
echo "=== [2/4] exit=$? $(date -u)"

echo "=== [3/4] 5-stage pipeline e2e at shipping configs $(date -u)"
timeout 6000 python -u examples/full_pipeline_synthetic.py \
    --workdir /root/scratch/pipe_r5 \
    --out examples/results/pipeline_e2e.json
echo "=== [3/4] exit=$? $(date -u)"

echo "=== [4/4] OBB regen + chunked retrain (resumable; eval per chunk) $(date -u)"
timeout 10800 python -u examples/obb_end_to_end.py \
    --root /root/scratch/synobb --out examples/results/obb_e2e.json \
    --num_scenes 24 --resolution 128 --epochs 240 --chunk_epochs 40 \
    --batch_size 4
echo "=== [4/4] exit=$? $(date -u)"
echo "=== queue r5e done $(date -u)"
