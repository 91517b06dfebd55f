#!/bin/bash
# After flagship2: validate the production-shaped bench train probe and
# refresh the bench artifact on the (by then warm) cache.
set -u
cd /root/repo
while [ ! -f /tmp/flagship2_done ]; do sleep 120; done
sleep 30
echo "=== bench.py full refresh $(date) ==="
timeout 9000 python bench.py > /tmp/bench_r02b.log 2>&1
echo "bench rc=$?"
grep -h '"metric"' /tmp/bench_r02b.log | tail -1 > artifacts/bench_final.json || true
sleep 10
echo "=== roofline refresh vs new bench $(date) ==="
timeout 2700 python -m raptor_tpu.apps.roofline \
  --bench artifacts/bench_final.json --out artifacts/roofline.json \
  > /tmp/roofline_final.log 2>&1
echo "roofline rc=$?"
touch /tmp/postflagship_done
echo "=== post-flagship queue done $(date) ==="
