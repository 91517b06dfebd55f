#!/bin/bash
# Round-5 session-1b chain — the demo-rate composite-label fix.
#
# demoDiag's instrumentation (diagnostics/severe_frac 12-26%,
# loss_severe ~5x BELOW loss_hover) falsified both "too few demo frames"
# and "student can't fit them". The sharpest surviving hypothesis: with
# a tilt-only label switch the mid-recovery ARREST states (tilt < 1.2
# but |w| ~ 8-10 rad/s) take teacher labels — states teachers never
# visit — so the composite policy starts the fast flip but never learns
# to stop it. --demo-rate extends demo labels to fast states.
#
#  A. demoRate:       --demo-tilt 1.2 --demo-rate 5.0        (labels only)
#  B. demoRateDrive:  + --demo-rollout-frac 0.25             (+ coverage)
#  C. physics-pure demonstrator sweep: per-airframe gains WITHOUT the
#     fixed w_cap/k_w ceilings (they can exceed the round-4 optimum on
#     high-authority frames; the capped variant measured worse).
set -u
cd /root/repo
END_TS=${1:?END_TS epoch}

while [ ! -f /tmp/r05_session1_done ]; do sleep 60; done

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
    if stage_ok 600 "eval_parity_$TAG"; then
      timeout $(( $(remaining) > 5400 ? 5400 : $(remaining) - 60 )) \
        python -m raptor_tpu.apps.eval_parity \
        --checkpoint "artifacts/student_${TAG}.h5" \
        --out "artifacts/eval_parity_${TAG}.json" \
        > "/tmp/eval_parity_${TAG}.log" 2>&1
      echo "eval_parity $TAG rc=$? $(date)"
    fi
  fi
}

if stage_ok 3600 demoRate; then
  distill_stage experiments/union_rec640_packs.txt demoRate 3600 \
    --demo-tilt 1.2 --demo-rate 5.0 --diagnostics
fi

if stage_ok 3600 demoRateDrive; then
  distill_stage experiments/union_rec640_packs.txt demoRateDrive 3600 \
    --demo-tilt 1.2 --demo-rate 5.0 --demo-rollout-frac 0.25 --diagnostics
fi

if stage_ok 1200 physics_pure_sweep; then
  timeout 1200 python -m raptor_tpu.apps.scripted_recovery \
    --w-cap 999 --k-w 999 \
    --grid "0.4:0.8:2.0;0.5:0.8:2.0;0.65:0.8:2.0;0.5:1.2:3.0;0.4:1.2:3.0" \
    --out artifacts/scripted_recovery_physpure.json \
    > /tmp/scripted_physpure.log 2>&1
  echo "physics-pure sweep rc=$? $(date)"
fi

touch /tmp/r05_session1b_done
echo "=== session1b chain done, TPU idle $(date) ==="
