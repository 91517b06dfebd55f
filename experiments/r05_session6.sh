#!/bin/bash
# Round-5 session-6 (final round endgame) — one targeted distill after the
# curated-union results: curated union x physics-pure demonstrator labels,
# chasing a single student with held-out cf >= 420 AND a clean parity gate
# (demoRatePure hit 421.0 cf but 6.2% parity termination; the hover-gate
# curation removes the mechanism behind such tails if it is teacher noise).
set -u
cd /root/repo
END_TS=${1:?END_TS epoch}

while [ ! -f /tmp/r05_session5_done ]; do sleep 60; done

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
  fi
}

# ---- 1: curated union x physics-pure labels -------------------------------
if stage_ok 1500 rateFlagCurPure; then
  distill_stage experiments/union_cur691_packs.txt rateFlagCurPure 1800 \
    --demo-tilt 1.2 --demo-rate 5.0 --demo-adaptive \
    --demo-w-cap 999 --demo-k-w 999 \
    --demo-c-flip 0.65 --demo-c-lag 0.8 --demo-c-bw 2.0
  env -u PALLAS_AXON_POOL_IPS PYTHONPATH=/root/repo:/root/.axon_site \
    JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu timeout 600 \
    python tools/hover_tail_probe.py artifacts/student_rateFlagCurPure.h5 \
    --angle 0.2 --out artifacts/hover_tail_rateFlagCurPure.json \
    > /tmp/hover_tail_curpure.log 2>&1
  echo "hover probe rc=$? $(date)"
fi

# ---- 2: failure modes on the best-of-round (pi-agg) student ---------------
BEST2=$(env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu \
  python - <<'EOF'
import glob, json, os
best, score, tag_best = "artifacts/student_demoRate.h5", -1.0, "demoRate"
for p in glob.glob("artifacts/eval_parity_*.json"):
    tag = os.path.basename(p)[len("eval_parity_"):-len(".json")]
    ck = f"artifacts/student_{tag}.h5"
    if not os.path.exists(ck):
        continue
    d = json.load(open(p))
    for row in d.get("sweep", []):
        if abs(row.get("max_angle", 0) - 3.14159) < 1e-3 and "student_aggregate" in row:
            s = row["student_aggregate"]["episode_length"]
            if s > score:
                best, score, tag_best = ck, s, tag
print(best + " " + tag_best)
EOF
)
BESTCK=${BEST2% *}; BESTTAG=${BEST2#* }
echo "failure modes on: $BESTCK ($BESTTAG)"
if [ ! -f "artifacts/failure_modes_${BESTTAG}.json" ] && stage_ok 600 failure_modes_best2; then
  timeout $(( $(remaining) > 1200 ? 1200 : $(remaining) - 60 )) \
    python -m raptor_tpu.apps.failure_modes \
    --checkpoint "$BESTCK" \
    --out "artifacts/failure_modes_${BESTTAG}.json" \
    > /tmp/failure_modes_best2.log 2>&1
  echo "failure_modes rc=$? $(date)"
fi

touch /tmp/r05_session6_done
echo "=== session6 chain done, TPU idle $(date) ==="
