#!/bin/bash
# Round-5 session-4 — endgame: the gain-blend interpolation + round-end
# hygiene (bench warm-up, full CPU suite), gated on session-3b.
#
# demoRatePure (c_flip 0.65/0.8/2.0) hit cf-pi 421.0 but regressed the
# aggregate (parity 482.8 @ 6.2%); the OTHER physics-pure grid optimum
# (c_flip 0.5 / c_lag 1.2 / c_bw 3.0 — best AGGREGATE witness at 26.2%,
# cf 6.6%) is the natural interpolation toward one student holding both.
set -u
cd /root/repo
END_TS=${1:?END_TS epoch}

while [ ! -f /tmp/r05_session3b_done ]; do sleep 60; done

remaining() { echo $(( END_TS - $(date +%s) )); }
stage_ok() {
  local R; R=$(remaining)
  if [ "$R" -gt "$1" ]; then
    echo "=== stage $2 start (remaining ${R}s, est $1s) $(date) ==="
    return 0
  fi
  echo "=== stage $2 SKIPPED (remaining ${R}s < est $1s) $(date) ==="
  return 1
}

distill_stage() {
  local PACK=$1 TAG=$2 TMO=$3; shift 3
  local STAMP=/tmp/stamp_$TAG
  touch "$STAMP"
  timeout "$TMO" python -m raptor_tpu.apps.post_training "$PACK" \
    --rounds 160 --envs-per-teacher 8 --teachers-per-round 118 \
    --aggregate-capacity 40960 --grad-steps-per-round 913 \
    --teacher-mix-rounds 3 --eval-max-angle 1.0 --eval-every-rounds 10 \
    --collect-angle-power 4 --seed 0 "$@" \
    > "/tmp/distill_${TAG}.log" 2>&1
  local RC=$?
  echo "distill $TAG rc=$RC $(date)"
  local STUDENT
  STUDENT=$(grep -o "experiments/[^ ]*final\.h5" "/tmp/distill_${TAG}.log" | tail -1)
  if [ -z "$STUDENT" ] || [ ! -f "$STUDENT" ]; then
    STUDENT=$(find experiments -name '*.h5' -newer "$STAMP" \
              -path '*post_training*' 2>/dev/null | xargs -r ls -t | head -1)
    echo "using periodic checkpoint owned by this stage: $STUDENT"
  fi
  if [ -n "$STUDENT" ] && [ -f "$STUDENT" ]; then
    cp "$STUDENT" "artifacts/student_${TAG}.h5"
    local RUN; RUN=$(dirname "$(dirname "$STUDENT")")
    cp "$(ls "$RUN"/events.out.tfevents.* | head -1)" \
      "artifacts/distill_${TAG}.tfevents" 2>/dev/null || true
    if stage_ok 300 "eval_parity_$TAG"; then
      timeout $(( $(remaining) > 1800 ? 1800 : $(remaining) - 60 )) \
        python -m raptor_tpu.apps.eval_parity \
        --checkpoint "artifacts/student_${TAG}.h5" \
        --out "artifacts/eval_parity_${TAG}.json" \
        > "/tmp/eval_parity_${TAG}.log" 2>&1
      echo "eval_parity $TAG rc=$? $(date)"
    fi
  fi
}

# ---- 1: aggregate-optimal physics-pure gains ------------------------------
if stage_ok 2400 demoRateMix; then
  distill_stage experiments/union_rec640_packs.txt demoRateMix 1800 \
    --demo-tilt 1.2 --demo-rate 5.0 --demo-adaptive \
    --demo-w-cap 999 --demo-k-w 999 \
    --demo-c-flip 0.5 --demo-c-lag 1.2 --demo-c-bw 3.0 --diagnostics
fi

# ---- 2 (opportunistic): seed replicate of the cf-target run ---------------
if stage_ok 3000 demoRatePureS1; then
  STAMP=/tmp/stamp_demoRatePureS1; touch "$STAMP"
  timeout 1800 python -m raptor_tpu.apps.post_training \
    experiments/union_rec640_packs.txt \
    --rounds 160 --envs-per-teacher 8 --teachers-per-round 118 \
    --aggregate-capacity 40960 --grad-steps-per-round 913 \
    --teacher-mix-rounds 3 --eval-max-angle 1.0 --eval-every-rounds 20 \
    --collect-angle-power 4 --seed 1 \
    --demo-tilt 1.2 --demo-rate 5.0 --demo-adaptive \
    --demo-w-cap 999 --demo-k-w 999 \
    --demo-c-flip 0.65 --demo-c-lag 0.8 --demo-c-bw 2.0 \
    > /tmp/distill_demoRatePureS1.log 2>&1
  echo "distill demoRatePureS1 rc=$? $(date)"
  STUDENT=$(grep -o "experiments/[^ ]*final\.h5" /tmp/distill_demoRatePureS1.log | tail -1)
  if [ -n "$STUDENT" ] && [ -f "$STUDENT" ]; then
    cp "$STUDENT" artifacts/student_demoRatePureS1.h5
    if stage_ok 300 eval_parity_demoRatePureS1; then
      timeout $(( $(remaining) > 1800 ? 1800 : $(remaining) - 60 )) \
        python -m raptor_tpu.apps.eval_parity \
        --checkpoint artifacts/student_demoRatePureS1.h5 \
        --out artifacts/eval_parity_demoRatePureS1.json \
        > /tmp/eval_parity_demoRatePureS1.log 2>&1
      echo "eval_parity demoRatePureS1 rc=$? $(date)"
    fi
  fi
fi

# ---- 3: bench warm-up (round-end: the driver re-runs this) ----------------
if stage_ok 900 bench_warm; then
  timeout $(( $(remaining) > 2400 ? 2400 : $(remaining) - 300 )) \
    python bench.py > /tmp/bench_warm.log 2>&1
  echo "bench rc=$? $(date)"
  tail -1 /tmp/bench_warm.log
fi

# ---- 4: full CPU suite (TPU idle from here) -------------------------------
if stage_ok 300 full_suite; then
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu \
    timeout $(( $(remaining) > 2700 ? 2700 : $(remaining) - 30 )) \
    python -m pytest tests/ -q > /tmp/pytest_final.log 2>&1
  echo "pytest rc=$? $(date)"
  tail -2 /tmp/pytest_final.log
fi

touch /tmp/r05_session4_done
echo "=== session4 chain done, TPU idle $(date) ==="
