#!/bin/bash
# Round-5 TPU queue, stage A (fresh VM: /root/scratch and the TPU compile
# cache were lost in a machine move; datasets regenerate from seeds).
# Serialized: one chip, one client at a time. Partial results land
# atomically per unit (CLAUDE.md).
# Usage: nohup bash examples/tpu_queue_r5d.sh > /root/scratch/queue_r5d.log 2>&1 &
set -u
cd /root/repo
mkdir -p /root/scratch examples/results

# Quality arms first (not timing-sensitive; the concurrent pytest run on
# the single CPU core would skew probe23b's scan-true timings).
echo "=== [1/2] quality arms: anneal / autoK / bktE / L2F6 / S32 $(date -u)"
timeout 12600 python -u examples/fast_quality_multi.py \
    --num_scenes 6 --holdout_views 2 \
    --arms fast_bktC_S48_anneal,fast_autoK_S48,fast_bktE_S48,fast_L2F6_bktE_S48,fast_L2F6_bktE_S32 \
    --out examples/results/fast_quality_r5.json
echo "=== [1/2] exit=$? $(date -u)"

echo "=== [2/2] probe23b S=32 candidates $(date -u)"
timeout 4500 python -u examples/probe23b_s32.py
echo "=== [2/2] exit=$? $(date -u)"
cp /tmp/probe23b.json examples/results/probe23b_s32.json 2>/dev/null
echo "=== queue r5d done $(date -u)"
