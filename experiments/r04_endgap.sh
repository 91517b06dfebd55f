#!/bin/bash
# Round-4 session-5 end-gap: after the TPU chain finishes (done file),
# run the host-side round-close work in sequence (host CPU was kept
# quiet while TPU jobs ran — NOTES.md rule):
#   1. full pytest suite (pure-CPU isolated)
#   2. bench_scaling regeneration with host-core oversubscription
#      annotations (VERDICT r3 item 5)
#   3. bench.py on the now-idle TPU (warms the driver's round-end run)
# Deadline-gated like the main chain.
set -u
cd /root/repo
END_TS=${1:?usage: r04_endgap.sh END_TS_epoch}

while [ ! -f /tmp/r04_session5_done ]; do sleep 30; done
echo "=== endgap start $(date) ==="

remaining() { echo $(( END_TS - $(date +%s) )); }

if [ "$(remaining)" -gt 1500 ]; then
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu \
    timeout 2400 python -m pytest tests/ -q \
    > /tmp/pytest_r04s5.log 2>&1
  echo "pytest rc=$? $(date): $(tail -1 /tmp/pytest_r04s5.log)"
fi

if [ "$(remaining)" -gt 600 ]; then
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu \
    timeout 900 python -m raptor_tpu.apps.bench_scaling \
    --out artifacts/bench_scaling.json > /tmp/bench_scaling_r04.log 2>&1
  echo "bench_scaling rc=$? $(date)"
fi

if [ "$(remaining)" -gt 300 ]; then
  timeout "$(remaining)" python bench.py > /tmp/bench_r04_warm.json 2>/tmp/bench_r04_warm.err
  echo "bench rc=$? $(date)"
  tail -1 /tmp/bench_r04_warm.json
fi

touch /tmp/r04_endgap_done
echo "=== endgap done $(date) ==="
