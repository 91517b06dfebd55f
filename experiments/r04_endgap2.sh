#!/bin/bash
# Round-4 session-5 end-gap v2 (replaces r04_endgap.sh): once the main
# chain is done (done-file), in priority order on the freed TPU/host:
#   0. student-capacity ablation: hidden-32 distill over the 512-pack
#      union at the currP4 recipe (isolates the capacity hypothesis for
#      the pi-start ceiling; ~12 min warm) + eval_parity sweep
#   1. full pytest suite (pure-CPU isolated)
#   2. bench_scaling regeneration (host-core annotations, VERDICT r3 #5)
#   3. bench.py on the idle TPU (warms the driver's round-end run)
set -u
cd /root/repo
END_TS=${1:?usage: r04_endgap2.sh END_TS_epoch}

while [ ! -f /tmp/r04_session5_done ]; do sleep 30; done
echo "=== endgap2 start $(date) ==="

remaining() { echo $(( END_TS - $(date +%s) )); }

if [ "$(remaining)" -gt 2400 ]; then
  echo "=== cap32 distill start $(date) ==="
  timeout 2400 python -m raptor_tpu.apps.post_training \
    experiments/union_r03_packs.txt \
    --rounds 160 --envs-per-teacher 8 --teachers-per-round 118 \
    --aggregate-capacity 40960 --grad-steps-per-round 913 \
    --teacher-mix-rounds 3 --eval-max-angle 1.0 --eval-every-rounds 10 \
    --collect-angle-power 4 --student-hidden 32 --seed 0 \
    > /tmp/distill_cap32.log 2>&1
  RC=$?
  echo "distill cap32 rc=$RC $(date)"
  STUDENT=$(grep -o "experiments/[^ ]*final\.h5" /tmp/distill_cap32.log | tail -1)
  if [ "$RC" -eq 0 ] && [ -n "$STUDENT" ] && [ -f "$STUDENT" ]; then
    cp "$STUDENT" artifacts/student_cap32_collP4.h5
    RUN=$(dirname "$(dirname "$STUDENT")")
    cp $(ls "$RUN"/events.out.tfevents.* | head -1) \
      artifacts/distill_cap32_collP4.tfevents || true
    if [ "$(remaining)" -gt 900 ]; then
      timeout 1800 python -m raptor_tpu.apps.eval_parity \
        --checkpoint artifacts/student_cap32_collP4.h5 \
        --out artifacts/eval_parity_cap32_collP4.json \
        > /tmp/eval_parity_cap32.log 2>&1
      echo "eval_parity cap32 rc=$? $(date)"
    fi
  fi
fi

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
echo "=== endgap2 done $(date) ==="
