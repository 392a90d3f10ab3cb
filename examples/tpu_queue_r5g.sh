#!/bin/bash
# Round-5 TPU queue, stage D. Run AFTER probe25 finishes.
# [1] pipeline re-cert with the FIXED relative projection threshold
#     (the 08:39 run matched 0 views through the absolute one);
# [2] the chunked OBB retrain (from tpu_queue_r5f.sh; dataset regen is
#     seeded/deterministic, eval canonicalizes yaw under the box
#     symmetry group).
# Usage: nohup bash examples/tpu_queue_r5g.sh > /root/scratch/queue_r5g.log 2>&1 &
set -u
cd /root/repo
mkdir -p /root/scratch examples/results

echo "=== [1/2] 5-stage pipeline e2e, fixed projector $(date -u)"
timeout 6000 python -u examples/full_pipeline_synthetic.py \
    --workdir /root/scratch/pipe_r5b \
    --out examples/results/pipeline_e2e.json
echo "=== [1/2] exit=$? $(date -u)"

echo "=== [2/2] OBB regen + chunked retrain (canonicalized yaw eval) $(date -u)"
timeout 10800 python -u examples/obb_end_to_end.py \
    --root /root/scratch/synobb --out examples/results/obb_e2e.json \
    --num_scenes 24 --resolution 128 --epochs 240 --chunk_epochs 40 \
    --batch_size 4
echo "=== [2/2] exit=$? $(date -u)"
echo "=== queue r5g done $(date -u)"
