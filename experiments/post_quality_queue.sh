#!/bin/bash
# Post-teacher-quality TPU queue (sole-TPU-process discipline):
# 1. collect-kernel parity probe (updated: XLA ref at both matmul precisions)
# 2. bench_collect with the honest-precision parity gate (expect the kernel
#    to pass now that the XLA reference is not bf16-rounded)
# 3. roofline: measured VPU FMA peak + utilization of the fused kernels
set -u
cd /root/repo
while [ ! -f /tmp/teacher_quality_done ]; do sleep 60; done
sleep 30

echo "=== collect parity probe (TPU) $(date) ==="
timeout 2700 python experiments/probe_collect_parity.py \
  > /tmp/probe_parity_tpu.log 2>&1
echo "probe rc=$?"
sleep 15

echo "=== bench_collect v4 (honest-precision gate) $(date) ==="
timeout 3600 python -m raptor_tpu.apps.bench_collect \
  experiments/union640_checkpoints.txt \
  --envs-per-teacher 8 --out artifacts/bench_collect_r02.json \
  > /tmp/bench_collect_v4.log 2>&1
echo "bench_collect rc=$?"
sleep 15

echo "=== roofline (TPU) $(date) ==="
timeout 2700 python -m raptor_tpu.apps.roofline \
  --bench artifacts/bench_final.json --out artifacts/roofline.json \
  > /tmp/roofline_tpu.log 2>&1
echo "roofline rc=$?"
touch /tmp/post_quality_done
echo "=== post-quality queue done $(date) ==="
