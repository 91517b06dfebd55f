#!/bin/bash
# Round-4 session-5 serialized TPU queue (post-reimage rerun of the lost
# chains, VERDICT r3 items 2/6/8):
#   A. severity-teacher wave seed 2000 (--init-angle-power 3; the prior
#      attempt hung at 5655/6000 and died with the reimage) -> pack ->
#      eval_teachers (full-attitude competence vs the uniform-init pack)
#   B. 640-teacher union (512 uniform x 30.7M + 128 severity) matched-
#      budget distill with collect curriculum P4 -> eval_parity sweep
#      (the pi-start flagship candidate)
#   C. BPTT-SAC diagnosis privB_1x: privileged critics at the round-3
#      budget -> eval_parity (isolates the asymmetric-critic effect)
#   D. waves 1500/1600 (--sample-rows) -> K=1024 x 30.7M distill ->
#      eval_parity (completes the K-scaling grid)
#   E. BPTT-SAC privA_4x: 4x budget + critic width 32 -> eval_parity
# Every stage is deadline-gated so the TPU goes idle before the round
# boundary (NOTES.md scheduling rule). Waves pack from the newest
# checkpoints.txt regardless of rc: periodic exports make a hung wave
# recoverable at <=2.56M env-steps of loss.
set -u
cd /root/repo
END_TS=${1:?usage: r04_session5.sh END_TS_epoch}

remaining() { echo $(( END_TS - $(date +%s) )); }
stage_ok() {  # stage_ok <est_seconds> <name>
  local R; R=$(remaining)
  if [ "$R" -gt "$1" ]; then
    echo "=== stage $2 start (remaining ${R}s, est $1s) $(date) ==="
    return 0
  fi
  echo "=== stage $2 SKIPPED (remaining ${R}s < est $1s) $(date) ==="
  return 1
}

run_wave() {  # run_wave <seed> <pack_path> <extra flags...>
  local SEED=$1 PACK=$2; shift 2
  timeout 5400 python -m raptor_tpu.apps.pre_training \
    --population 128 --super-steps 6000 --steps-per-call 10 \
    --replay-capacity 1536 --seed "$SEED" --checkpoint-every 500 \
    --sample-rows "$@" \
    > "/tmp/pretrain_w${SEED}.log" 2>&1
  echo "wave $SEED rc=$? $(date)"
  local M
  M=$(ls -dt experiments/*/*_pre_training/checkpoints.txt 2>/dev/null | head -1)
  if [ -n "$M" ]; then
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu \
      timeout 1800 python -m raptor_tpu.apps.pack_teachers pack "$M" "$PACK" \
      >> /tmp/pack_waves_r04s5.log 2>&1
    echo "pack $PACK rc=$? $(date)"
  fi
}

run_distill() {  # run_distill <tag> <manifest> <extra flags...>
  local TAG=$1 MANIFEST=$2; shift 2
  timeout 3600 python -m raptor_tpu.apps.post_training "$MANIFEST" \
    --rounds 160 --envs-per-teacher 8 --teachers-per-round 118 \
    --aggregate-capacity 40960 --grad-steps-per-round 913 \
    --teacher-mix-rounds 3 --eval-max-angle 1.0 --eval-every-rounds 10 \
    --seed 0 "$@" \
    > "/tmp/distill_${TAG}.log" 2>&1
  local RC=$?
  echo "distill $TAG rc=$RC $(date)"
  local STUDENT
  STUDENT=$(grep -o "experiments/[^ ]*final\.h5" "/tmp/distill_${TAG}.log" | tail -1)
  if [ "$RC" -eq 0 ] && [ -n "$STUDENT" ] && [ -f "$STUDENT" ]; then
    cp "$STUDENT" "artifacts/student_${TAG}.h5"
    local RUN
    RUN=$(dirname "$(dirname "$STUDENT")")
    cp $(ls "$RUN"/events.out.tfevents.* | head -1) \
      "artifacts/distill_${TAG}.tfevents" || true
    timeout 3000 python -m raptor_tpu.apps.eval_parity \
      --checkpoint "artifacts/student_${TAG}.h5" \
      --out "artifacts/eval_parity_${TAG}.json" \
      > "/tmp/eval_parity_${TAG}.log" 2>&1
    echo "eval_parity $TAG rc=$? $(date)"
  fi
}

run_gru() {  # run_gru <tag> <super_steps> <critic_hidden>
  local TAG=$1 SS=$2 CH=$3
  timeout 7200 python -m raptor_tpu.apps.train_gru_sac \
    --n-envs 1024 --super-steps "$SS" --rollout-length 64 \
    --steps-per-call 10 --gradient-steps 8 --batch-size 64 --seq-len 64 \
    --critic-hidden "$CH" \
    --eval-every 20 --eval-max-angle 1.0 --seed 0 \
    > "/tmp/gru_sac_${TAG}.log" 2>&1
  echo "gru_sac $TAG rc=$? $(date)"
  local GRU
  GRU=$(grep -o "experiments/[^ ]*\.h5" "/tmp/gru_sac_${TAG}.log" | tail -1)
  if [ -n "$GRU" ] && [ -f "$GRU" ]; then
    local RUN
    RUN=$(dirname "$(dirname "$GRU")")
    cp "$GRU" "artifacts/gru_sac_${TAG}.h5"
    cp $(ls "$RUN"/events.out.tfevents.* | head -1) \
      "artifacts/gru_sac_${TAG}.tfevents" || true
    timeout 3000 python -m raptor_tpu.apps.eval_parity \
      --checkpoint "artifacts/gru_sac_${TAG}.h5" \
      --out "artifacts/eval_parity_gru_sac_${TAG}.json" \
      > "/tmp/eval_parity_gru_${TAG}.log" 2>&1
    echo "eval_parity gru $TAG rc=$? $(date)"
  fi
}

# --- A: severity wave -------------------------------------------------
if stage_ok 5700 sev_wave; then
  run_wave 2000 artifacts/teachers_sev2000_30M.npz --init-angle-power 3
  if [ -f artifacts/teachers_sev2000_30M.npz ] && stage_ok 900 eval_teachers_sev; then
    timeout 1800 python -m raptor_tpu.apps.eval_teachers \
      artifacts/teachers_sev2000_30M.npz \
      --out artifacts/eval_teachers_sev2000.json \
      > /tmp/eval_teachers_sev2000.log 2>&1
    echo "eval_teachers sev rc=$? $(date)"
  fi
fi

# --- B: 640-union severity flagship candidate -------------------------
if [ -f artifacts/teachers_sev2000_30M.npz ] && stage_ok 3300 distill_sev640; then
  UNION=experiments/union640sev_packs.txt
  cat experiments/union_r03_packs.txt > "$UNION"
  echo artifacts/teachers_sev2000_30M.npz >> "$UNION"
  run_distill sev640_collP4 "$UNION" --collect-angle-power 4 --diagnostics
fi

# --- C: BPTT-SAC privileged critics, r03 budget ------------------------
if stage_ok 2700 gru_privB; then
  run_gru privB_1x 380 16
fi

# --- D: K=1024 grid completion -----------------------------------------
if stage_ok 6600 waves_1500_1600; then
  run_wave 1500 artifacts/teachers_seed1500_30M.npz
  if stage_ok 3300 wave_1600; then
    run_wave 1600 artifacts/teachers_seed1600_30M.npz
  fi
  NPACKS=$(ls artifacts/teachers_seed*_30M.npz | grep -v 900row | wc -l)
  if [ "$NPACKS" -ge 8 ] && stage_ok 2400 distill_1024; then
    UNION=experiments/union1024_packs.txt
    ls artifacts/teachers_seed*_30M.npz | grep -v 900row | sort > "$UNION"
    run_distill 1024x30M "$UNION"
  fi
fi

# --- E: BPTT-SAC 4x budget, wide critics --------------------------------
if stage_ok 3300 gru_privA; then
  run_gru privA_4x 1520 32
fi

touch /tmp/r04_session5_done
echo "=== r04 session5 chain done, TPU idle $(date) ==="
