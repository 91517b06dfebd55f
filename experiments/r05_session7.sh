#!/bin/bash
# Round-5 session-7 — isolate the residual parity tail of the curated
# flagship (rateFlagCur: pi-agg 358.5 best-yet but 3 slow-motor frames
# still fail 25% at hover):
#  1. rateFlagCurStrict — stricter hover-gate (max-term 0.25, 660
#     teachers): is the residual the marginal (0.25-term) teachers?
#  2. rateCur577 — curated union WITHOUT the demo2500 pack: is it the
#     demo-seeded cohort's aggressive labels?
set -u
cd /root/repo
END_TS=${1:?END_TS epoch}

while [ ! -f /tmp/r05_session6_done ]; do sleep 60; done

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
  echo "distill $TAG rc=$? $(date)"
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
    env -u PALLAS_AXON_POOL_IPS PYTHONPATH=/root/repo:/root/.axon_site \
      JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu timeout 600 \
      python tools/hover_tail_probe.py "artifacts/student_${TAG}.h5" \
      --angle 0.2 --out "artifacts/hover_tail_${TAG}.json" \
      > "/tmp/hover_tail_${TAG}.log" 2>&1
    echo "hover probe $TAG rc=$? $(date)"
  fi
}

if stage_ok 1500 rateFlagCurStrict; then
  distill_stage experiments/union_strict660_packs.txt rateFlagCurStrict 1800 \
    --demo-tilt 1.2 --demo-rate 5.0
fi

if stage_ok 1500 rateCur577; then
  distill_stage experiments/union_cur577_packs.txt rateCur577 1800 \
    --demo-tilt 1.2 --demo-rate 5.0
fi

touch /tmp/r05_session7_done
echo "=== session7 chain done, TPU idle $(date) ==="
