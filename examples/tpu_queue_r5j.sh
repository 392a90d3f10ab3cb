#!/bin/bash
# Round-5 TPU queue, stage G — reordered continuation of r5i after the
# stage-5 forensics: the pipeline's 0.0 mIoU traced to a dt-dependent
# GT-mask threshold in make_synthetic_nerf_scene (whole views flipped
# empty) + label-starved tiny instances; both fixed. Pipeline re-cert is
# now the highest-value run, ahead of probe26/probe27.
# Waits for the in-flight OBB retrain (started by r5i) to release the
# TPU, then runs one job at a time.
# Usage: nohup bash examples/tpu_queue_r5j.sh OBB_PID > /root/scratch/queue_r5j.log 2>&1 &
set -u
cd /root/repo
OBB_PID=${1:?pass the obb python pid}
while kill -0 "$OBB_PID" 2>/dev/null; do sleep 30; done
echo "=== OBB retrain (pid $OBB_PID) finished $(date -u)"

echo "=== [1/3] 5-stage pipeline e2e, view-filling scene $(date -u)"
timeout 4800 python -u examples/full_pipeline_synthetic.py \
    --workdir /root/scratch/pipe_r5e \
    --out examples/results/pipeline_e2e.json
echo "=== [1/3] exit=$? $(date -u)"

echo "=== [2/3] probe26 fleet-scaling knee $(date -u)"
timeout 4500 python -u examples/probe26_fleet_knee.py
echo "=== [2/3] exit=$? $(date -u)"
cp /tmp/probe26.json examples/results/probe26_fleet_knee.json 2>/dev/null

echo "=== [3/3] probe27 RCNN parts $(date -u)"
timeout 4200 python -u examples/probe27_rcnn_parts.py
echo "=== [3/3] exit=$? $(date -u)"
cp /tmp/probe27.json examples/results/probe27_rcnn_parts.json 2>/dev/null
echo "=== queue r5j done $(date -u)"
