#!/bin/bash
# Round-5 session-1 chain (VERDICT r4 items 1, 2, 5).
#
# 1. adaptive-demonstrator grid sweep (lever 3): per-airframe gain caps vs
#    the fixed round-4 optimum (28.5% agg / 14.5% cf at pi).
# 2. demoDiag: the EXACT round-4 demo640 recipe re-run with the new
#    severe-state instrumentation (--diagnostics now logs severe_frac,
#    loss_severe vs loss_hover per round) — the measurement VERDICT item 1
#    demands before any new variant.
# 3. demoDrive: + --demo-rollout-frac 0.25 — demonstrator-DRIVEN collect
#    envs (state coverage of the expert's recovery trajectory), the
#    hypothesized fix for the null demo640 result.
# 4. demoDriveW: demoDrive + --severe-weight 4 (loss reweighting lever,
#    isolated on top of coverage).
# 5-7. capacity ablation (VERDICT item 2): --student-hidden 32/48/24 at
#    the currP4 recipe, eval-parity sweep each.
#
# Targets: pi-agg >= 400/500, held-out crazyflie >= 420/500, parity
# protocol >= 495/500 @ <= 1.5%.
set -u
cd /root/repo
END_TS=${1:?END_TS epoch}

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

# distill stage helper: run post_training with the currP4 base recipe on
# $1=pack-manifest, $2=tag, $3=timeout, remaining args appended.
# Artifact ownership (ADVICE r4): the final.h5 path is grepped from THIS
# run's log; the timeout fallback only accepts checkpoints newer than the
# stage-start stamp.
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

# ---- stage 1: adaptive demonstrator sweep ---------------------------------
if stage_ok 2400 adaptive_sweep; then
  timeout 2400 python -m raptor_tpu.apps.scripted_recovery \
    --grid "1:0.8:1.5;1:0.6:1.0;1:1.0:2.0;0.7:0.8:1.5" \
    --out artifacts/scripted_recovery_adaptive.json \
    > /tmp/scripted_adaptive.log 2>&1
  echo "adaptive sweep rc=$? $(date)"
fi

# ---- stage 2: instrumented control (exact demo640 recipe + diagnostics) ---
if stage_ok 7200 demoDiag; then
  distill_stage experiments/union_rec640_packs.txt demoDiag \
    $(( $(remaining) - 3600 > 7200 ? 7200 : $(remaining) - 3600 )) \
    --demo-tilt 1.2 --diagnostics
fi

# ---- stage 3: demonstrator-driven collect (the coverage fix) --------------
if stage_ok 3600 demoDrive; then
  distill_stage experiments/union_rec640_packs.txt demoDrive 3600 \
    --demo-tilt 1.2 --demo-rollout-frac 0.25 --diagnostics
fi

# ---- stage 4: + severe-state loss weighting -------------------------------
if stage_ok 3600 demoDriveW; then
  distill_stage experiments/union_rec640_packs.txt demoDriveW 3600 \
    --demo-tilt 1.2 --demo-rollout-frac 0.25 --severe-weight 4.0 \
    --diagnostics
fi

# ---- stages 5-7: capacity ablation at currP4 (no demo) --------------------
for H in 32 48 24; do
  if stage_ok 3600 "cap$H"; then
    distill_stage experiments/union_r03_packs.txt "cap$H" 3600 \
      --student-hidden "$H"
  fi
done

touch /tmp/r05_session1_done
echo "=== session1 chain done, TPU idle $(date) ==="
