#!/bin/bash
# Round-5 session-3 chain — rebalanced endgame queue (replaces the queued
# r05_session2.sh, which would have spent 2.5h on the DDPGfD wave first and
# then skipped the fine-tune + its eval and run the TPU into the round-end
# bench window).
#
# Value order, given demoRate is the first lever that ever moved pi starts
# (350.2 @ 33.2% vs 326.0 @ 38.3% control — docs/RESULTS.md round-5):
#  1. demoRate7:  rate threshold 7 rad/s — the parity-recovery knob
#     (demoRate's only cost was 493.1 @ 2.3% at the 1.0-rad gate).
#  2. cap32:      student-hidden 32 x the demoRate recipe — the thrice-cut
#     capacity ablation (VERDICT r4 item 2).
#  3. demo2500:   DDPGfD demo-seeded teacher wave (VERDICT item 1 lever 1b)
#     + pack + per-teacher eval vs the severity wave's 36.1%.
#  4. rateFlag:   flagship — union(rec640 + demo2500) x the best measured
#     demo flags (chosen from the eval_parity artifacts at run time).
#  5. profile:    re-profile pre-training under --sample-rows (item 4).
#  6. gruft:      RL fine-tune from the best student (item 6), short.
#
# All stages stage_ok-gated so the chain degrades from the tail; the TPU
# must be idle well before the round-end bench (NOTES.md scheduling rule).
set -u
cd /root/repo
END_TS=${1:?END_TS epoch}

while [ ! -f /tmp/r05_session1b_done ]; do sleep 60; done

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
      timeout $(( $(remaining) > 2700 ? 2700 : $(remaining) - 60 )) \
        python -m raptor_tpu.apps.eval_parity \
        --checkpoint "artifacts/student_${TAG}.h5" \
        --out "artifacts/eval_parity_${TAG}.json" \
        > "/tmp/eval_parity_${TAG}.log" 2>&1
      echo "eval_parity $TAG rc=$? $(date)"
    fi
  fi
}

# ---- 1: rate-threshold sweep point ----------------------------------------
if stage_ok 4500 demoRate7; then
  distill_stage experiments/union_rec640_packs.txt demoRate7 2700 \
    --demo-tilt 1.2 --demo-rate 7.0 --diagnostics
fi

# ---- 2: capacity ablation (VERDICT r4 item 2, cut three times) ------------
if stage_ok 4500 cap32; then
  distill_stage experiments/union_rec640_packs.txt cap32 2700 \
    --demo-tilt 1.2 --demo-rate 5.0 --student-hidden 32 --diagnostics
fi

# ---- 3: DDPGfD demo-seeded wave (VERDICT item 1 lever 1b) -----------------
if stage_ok 7200 wave_demo2500; then
  STAMP=/tmp/stamp_wave2500; touch "$STAMP"
  T0=$(date +%s)
  timeout $(( $(remaining) - 1800 > 5400 ? 5400 : $(remaining) - 1800 )) \
    python -m raptor_tpu.apps.pre_training \
    --population 128 --super-steps 6000 --steps-per-call 10 \
    --replay-capacity 1536 --seed 2500 --checkpoint-every 500 \
    --sample-rows --init-angle-power 3 \
    --demo-seed-steps 48 --demo-every 1 \
    > /tmp/pretrain_demo2500.log 2>&1
  echo "wave demo2500 rc=$? wall=$(( $(date +%s) - T0 ))s $(date)"
  M=$(find experiments -name checkpoints.txt -newer "$STAMP" \
      -path '*pre_training*' 2>/dev/null | xargs -r ls -t | head -1)
  if [ -n "$M" ]; then
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu \
      timeout 1800 python -m raptor_tpu.apps.pack_teachers pack "$M" \
      artifacts/teachers_demo2500_30M.npz > /tmp/pack_demo2500.log 2>&1
    echo "pack rc=$? $(date)"
    if stage_ok 1500 eval_teachers_demo2500; then
      timeout 1500 python -m raptor_tpu.apps.eval_teachers \
        artifacts/teachers_demo2500_30M.npz \
        --out artifacts/eval_teachers_demo2500.json \
        > /tmp/eval_teachers_demo2500.log 2>&1
      echo "eval_teachers rc=$? $(date)"
    fi
  else
    echo "NO manifest owned by this wave — skipping pack"
  fi
fi

# ---- 4: flagship — union pack x best measured demo flags ------------------
FLAGS=$(env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu \
  python - <<'EOF'
import json, os
cands = {
    "demoRate": "--demo-tilt 1.2 --demo-rate 5.0",
    "demoRateDrive": "--demo-tilt 1.2 --demo-rate 5.0 --demo-rollout-frac 0.25",
    "demoRate7": "--demo-tilt 1.2 --demo-rate 7.0",
}
best, score = cands["demoRate"], -1.0
for tag, flags in cands.items():
    p = f"artifacts/eval_parity_{tag}.json"
    if not os.path.exists(p):
        continue
    d = json.load(open(p))
    pi = parity = None
    for row in d["sweep"]:
        if abs(row["max_angle"] - 3.14159) < 1e-3:
            pi = row.get("student_aggregate", {}).get("episode_length")
        if abs(row["max_angle"] - 1.0) < 1e-3:
            parity = row.get("student_aggregate", {}).get("episode_length")
    if pi is None:
        continue
    s = pi - (0.0 if (parity or 0) >= 490.0 else 50.0)  # hard parity guard
    if s > score:
        best, score = flags, s
print(best)
EOF
)
echo "flagship flags: $FLAGS"
if [ -f artifacts/teachers_demo2500_30M.npz ]; then
  cat experiments/union_rec640_packs.txt > experiments/union_rec768demo_packs.txt
  echo artifacts/teachers_demo2500_30M.npz >> experiments/union_rec768demo_packs.txt
  FLAGPACK=experiments/union_rec768demo_packs.txt
else
  FLAGPACK=experiments/union_rec640_packs.txt
fi
if stage_ok 4200 rateFlag; then
  # shellcheck disable=SC2086
  distill_stage "$FLAGPACK" rateFlag 2700 $FLAGS --diagnostics
fi

# ---- 5: re-profile pre-training under rows (VERDICT item 4) ---------------
if stage_ok 2700 profile_rows; then
  timeout 2400 python -m raptor_tpu.apps.profile_pretraining \
    --variants k128_unroll10,k128_rowsample_unroll10,k128_rowsample_train_only,k128_rowsample_collect_only,k256_rowsample_unroll10,k512_rowsample_unroll10 \
    --out artifacts/profile_pretraining_r05.json \
    > /tmp/profile_r05.log 2>&1
  echo "profile rc=$? $(date)"
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu \
    timeout 1200 python -m raptor_tpu.apps.profile_pretraining \
    --flops-only --out artifacts/profile_pretraining_r05.json \
    >> /tmp/profile_r05.log 2>&1
  echo "flops merge rc=$? $(date)"
fi

# ---- 6: RL fine-tune from the best student (VERDICT item 6) ---------------
BEST=$(env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu \
  python - <<'EOF'
import glob, json, os
best, score = "artifacts/student_currP4.h5", -1.0
for p in glob.glob("artifacts/eval_parity_*.json"):
    tag = os.path.basename(p)[len("eval_parity_"):-len(".json")]
    ck = f"artifacts/student_{tag}.h5"
    if not os.path.exists(ck):
        continue
    if tag.startswith("cap"):
        continue  # non-16 hidden cannot graft into the ft actor config
    d = json.load(open(p))
    for row in d.get("sweep", []):
        if abs(row.get("max_angle", 0) - 3.14159) < 1e-3 and "student_aggregate" in row:
            s = row["student_aggregate"]["episode_length"]
            if s > score:
                best, score = ck, s
print(best)
EOF
)
echo "fine-tune init: $BEST"
if stage_ok 3600 gru_ft; then
  STAMP=/tmp/stamp_gruft; touch "$STAMP"
  timeout $(( $(remaining) - 900 > 3000 ? 3000 : $(remaining) - 900 )) \
    python -m raptor_tpu.apps.train_gru_sac \
    --n-envs 1024 --super-steps 300 --rollout-length 64 \
    --steps-per-call 10 --gradient-steps 8 --batch-size 64 --seq-len 64 \
    --init-actor "$BEST" --actor-lr 1e-4 --init-angle-power 2 \
    --eval-every 20 --eval-max-angle 1.0 --seed 0 \
    > /tmp/gru_ft.log 2>&1
  echo "gru_ft rc=$? $(date)"
  GRU=$(grep -o "experiments/[^ ]*\.h5" /tmp/gru_ft.log | tail -1)
  if [ -z "$GRU" ] || [ ! -f "$GRU" ]; then
    GRU=$(find experiments -name '*.h5' -newer "$STAMP" -path '*gru_sac*' \
          2>/dev/null | xargs -r ls -t | head -1)
  fi
  if [ -n "$GRU" ] && [ -f "$GRU" ]; then
    cp "$GRU" artifacts/student_gruft_r05.h5
    RUN=$(dirname "$(dirname "$GRU")")
    cp "$(ls "$RUN"/events.out.tfevents.* | head -1)" \
      artifacts/gru_ft_r05.tfevents 2>/dev/null || true
    if stage_ok 900 eval_parity_gruft; then
      timeout $(( $(remaining) > 1800 ? 1800 : $(remaining) - 60 )) \
        python -m raptor_tpu.apps.eval_parity \
        --checkpoint artifacts/student_gruft_r05.h5 \
        --out artifacts/eval_parity_gruft_r05.json \
        > /tmp/eval_parity_gruft.log 2>&1
      echo "eval_parity gruft rc=$? $(date)"
    fi
  fi
fi

touch /tmp/r05_session3_done
echo "=== session3 chain done, TPU idle $(date) ==="
