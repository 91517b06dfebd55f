#!/bin/bash
# Round-5 session-5 — replaces r05_session4.sh (killed in its wait loop).
# Reprioritized after the hover-tail diagnosis (tools/hover_tail_probe.py):
# rateFlag's flat ~9% all-angle tail is the slowest-motor airframes, and
# every pack carries ~8-14% teachers that cannot hover their own frame
# (artifacts/eval_teachers_hover02*.json). The curated 691-teacher union
# (hover-gate max-term 0.5, apps/filter_teachers.py) is the highest-value
# remaining distill.
#
#  1. rateFlagCur  — curated union x demoRate flags (the flagship bet)
#  2. demoRatePureS1 — seed replicate of the cf>=420 champion
#  3. demoRateMix  — aggregate-optimal physics-pure gains (from old s4)
#  4. bench warm-up, 5. full CPU suite (round-end hygiene)
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
    --teacher-mix-rounds 3 --eval-max-angle 1.0 --eval-every-rounds 20 \
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

# ---- 1: curated-union flagship -------------------------------------------
if stage_ok 1500 rateFlagCur; then
  distill_stage experiments/union_cur691_packs.txt rateFlagCur 1800 \
    --demo-tilt 1.2 --demo-rate 5.0 --diagnostics
  # CPU hover-tail attribution for the fresh student (2 min, 4-core host
  # is briefly shared but the TPU is idle between stages here)
  env -u PALLAS_AXON_POOL_IPS PYTHONPATH=/root/repo:/root/.axon_site \
    JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu timeout 600 \
    python tools/hover_tail_probe.py artifacts/student_rateFlagCur.h5 \
    --angle 0.2 --out artifacts/hover_tail_rateFlagCur.json \
    > /tmp/hover_tail_cur.log 2>&1
  echo "hover probe rc=$? $(date)"
fi

# ---- 2: seed replicate of the cf>=420 champion ----------------------------
if stage_ok 1500 demoRatePureS1; then
  distill_stage experiments/union_rec640_packs.txt demoRatePureS1 1800 \
    --demo-tilt 1.2 --demo-rate 5.0 --demo-adaptive \
    --demo-w-cap 999 --demo-k-w 999 \
    --demo-c-flip 0.65 --demo-c-lag 0.8 --demo-c-bw 2.0
fi

# ---- 3: aggregate-optimal physics-pure gains (old session-4 stage 1) ------
if stage_ok 1500 demoRateMix; then
  distill_stage experiments/union_rec640_packs.txt demoRateMix 1800 \
    --demo-tilt 1.2 --demo-rate 5.0 --demo-adaptive \
    --demo-w-cap 999 --demo-k-w 999 \
    --demo-c-flip 0.5 --demo-c-lag 1.2 --demo-c-bw 3.0
fi

# ---- 4: opportunistic 2x-budget curated flagship --------------------------
if stage_ok 2700 rateFlagCurLong; then
  STAMP=/tmp/stamp_rateFlagCurLong; touch "$STAMP"
  timeout 2400 python -m raptor_tpu.apps.post_training \
    experiments/union_cur691_packs.txt \
    --rounds 320 --envs-per-teacher 8 --teachers-per-round 118 \
    --aggregate-capacity 40960 --grad-steps-per-round 913 \
    --teacher-mix-rounds 3 --eval-max-angle 1.0 --eval-every-rounds 40 \
    --collect-angle-power 4 --seed 0 \
    --demo-tilt 1.2 --demo-rate 5.0 \
    > /tmp/distill_rateFlagCurLong.log 2>&1
  echo "distill rateFlagCurLong rc=$? $(date)"
  STUDENT=$(grep -o "experiments/[^ ]*final\.h5" /tmp/distill_rateFlagCurLong.log | tail -1)
  if [ -z "$STUDENT" ] || [ ! -f "$STUDENT" ]; then
    STUDENT=$(find experiments -name '*.h5' -newer "$STAMP" \
              -path '*post_training*' 2>/dev/null | xargs -r ls -t | head -1)
  fi
  if [ -n "$STUDENT" ] && [ -f "$STUDENT" ]; then
    cp "$STUDENT" artifacts/student_rateFlagCurLong.h5
    RUN=$(dirname "$(dirname "$STUDENT")")
    cp "$(ls "$RUN"/events.out.tfevents.* | head -1)" \
      artifacts/distill_rateFlagCurLong.tfevents 2>/dev/null || true
    if stage_ok 600 eval_parity_rateFlagCurLong; then
      timeout $(( $(remaining) > 1800 ? 1800 : $(remaining) - 60 )) \
        python -m raptor_tpu.apps.eval_parity \
        --checkpoint artifacts/student_rateFlagCurLong.h5 \
        --out artifacts/eval_parity_rateFlagCurLong.json \
        > /tmp/eval_parity_rateFlagCurLong.log 2>&1
      echo "eval_parity rateFlagCurLong rc=$? $(date)"
    fi
  fi
fi

# ---- 5: bench warm-up (round-end: the driver re-runs this) ----------------
if stage_ok 900 bench_warm; then
  timeout $(( $(remaining) > 2400 ? 2400 : $(remaining) - 300 )) \
    python bench.py > /tmp/bench_warm.log 2>&1
  echo "bench rc=$? $(date)"
  tail -1 /tmp/bench_warm.log
fi

# ---- 6: full CPU suite (TPU idle from here) -------------------------------
if stage_ok 300 full_suite; then
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu \
    timeout $(( $(remaining) > 2700 ? 2700 : $(remaining) - 30 )) \
    python -m pytest tests/ -q > /tmp/pytest_final.log 2>&1
  echo "pytest rc=$? $(date)"
  tail -2 /tmp/pytest_final.log
fi

touch /tmp/r05_session5_done
echo "=== session5 chain done, TPU idle $(date) ==="
