#!/bin/bash
# After the 1024-teacher chain: (1) run the FIXED fused-collect benchmark
# (the 17:01 run crashed on a K=640 airframe-replication shape bug, fixed
# in bench_collect.py), (2) warm every bench.py sub — incl. the
# fused_policy_eval compile that timed out at 900 s — so the driver's
# end-of-round bench.py run is fast and complete.
set -u
cd /root/repo
while [ ! -f /tmp/waves1024_done ]; do sleep 60; done
sleep 15

echo "=== bench_collect v3 (fixed, union640) $(date) ==="
timeout 2700 python -m raptor_tpu.apps.bench_collect \
  experiments/union640_checkpoints.txt \
  --envs-per-teacher 8 --out artifacts/bench_collect_r02.json \
  > /tmp/bench_collect4.log 2>&1
echo "bench_collect v3 rc=$?"
sleep 10

echo "=== final bench $(date) ==="
timeout 7200 python bench.py > /tmp/bench_final.log 2>&1
echo "bench rc=$?"
tail -1 /tmp/bench_final.log
touch /tmp/final_bench_done
echo "=== final bench done $(date) ==="
