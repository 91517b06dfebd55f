#!/bin/bash
# After the 1024-teacher chain: warm every bench sub (incl. the
# fused_policy_eval compile that timed out at 900 s) so the driver's
# end-of-round bench.py run is fast and complete, and leave the line in
# /tmp/bench_final.log for inspection.
set -u
cd /root/repo
while [ ! -f /tmp/waves1024_done ]; do sleep 60; done
sleep 15
echo "=== final bench $(date) ==="
timeout 7200 python bench.py > /tmp/bench_final.log 2>&1
echo "bench rc=$?"
tail -1 /tmp/bench_final.log
touch /tmp/final_bench_done
echo "=== final bench done $(date) ==="
