#!/bin/bash
# Round-5 TPU queue, stage E. Run AFTER the OBB retrain (queue_r5g [2/3])
# finishes — one TPU job at a time (CLAUDE.md tunnel hazard).
# [1] pipeline re-cert with instance-only-density projection (stage-4
#     dry-run on pipe_r5b artifacts matched 6/8 views; the 2 misses have
#     empty GT segments);
# [2] probe26 fleet-knee localization (timing-sensitive: quiet host).
# Usage: nohup bash examples/tpu_queue_r5h.sh > /root/scratch/queue_r5h.log 2>&1 &
set -u
cd /root/repo
mkdir -p /root/scratch examples/results

echo "=== [1/3] 5-stage pipeline e2e, instance-only projection $(date -u)"
timeout 6000 python -u examples/full_pipeline_synthetic.py \
    --workdir /root/scratch/pipe_r5d \
    --out examples/results/pipeline_e2e.json
echo "=== [1/3] exit=$? $(date -u)"

echo "=== [2/3] probe26 fleet-scaling knee $(date -u)"
timeout 5400 python -u examples/probe26_fleet_knee.py
echo "=== [2/3] exit=$? $(date -u)"
cp /tmp/probe26.json examples/results/probe26_fleet_knee.json 2>/dev/null
echo "=== [3/3] probe27 RCNN parts $(date -u)"
timeout 4500 python -u examples/probe27_rcnn_parts.py
echo "=== [3/3] exit=$? $(date -u)"
cp /tmp/probe27.json examples/results/probe27_rcnn_parts.json 2>/dev/null
echo "=== queue r5h done $(date -u)"
