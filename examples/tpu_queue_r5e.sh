#!/bin/bash
# Round-5 TPU queue, stage B. Run AFTER tpu_queue_r5d.sh finishes.
# Timing-sensitive probes first (quiet host), then the pipeline re-cert,
# then a bench.py certification run of the new shipping config. The OBB
# retrain moved to tpu_queue_r5f.sh (after the yaw fix lands — VERDICT
# r4 #5: retraining the same recipe would reproduce the 20-58 deg theta
# errors).
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

echo "=== [4/4] bench.py certification of the L2F6_bktE_S32 ship config $(date -u)"
timeout 3600 python -u bench.py > /root/scratch/bench_r5_cert.json
echo "=== [4/4] exit=$? $(date -u)"
cat /root/scratch/bench_r5_cert.json
echo "=== queue r5e done $(date -u)"
