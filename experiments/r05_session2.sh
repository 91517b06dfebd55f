#!/bin/bash
# Round-5 session-2 chain (VERDICT r4 items 1b, 4, 6) — gated on session-1b.
#
#  A. re-profile pre-training under --sample-rows (item 4): fresh phase
#     split + K-geometry (does the population axis scale now that the
#     replay gather is gone?).
#  B. DDPGfD demo-seeded teacher wave (item 1 lever 1b): K=128 x 30.7M,
#     severity init curriculum, scripted demonstrations seeded into every
#     teacher's replay ring (~50% of the ring at start, ~9% steady).
#  C. pack + per-teacher eval: do demo-seeded teachers beat the severity
#     wave's 36.1% full-attitude termination?
#  D. RL fine-tune (item 6): GRU-SAC initialized from the best
#     session-1/1b student, severe-start curriculum, conservative LR.
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

# ---- A: profile under rows ------------------------------------------------
if stage_ok 3600 profile_rows; then
  timeout 3600 python -m raptor_tpu.apps.profile_pretraining \
    --variants k128_unroll10,k128_rowsample_unroll10,k128_rowsample_train_only,k128_rowsample_collect_only,k128_rowsample_fastpath_unroll10,k128_rowsample_bf16_unroll10,k256_rowsample_unroll10,k512_rowsample_unroll10 \
    --out artifacts/profile_pretraining_r05.json \
    > /tmp/profile_r05.log 2>&1
  echo "profile rc=$? $(date)"
  # FLOP accounting + roofline merge is platform-independent (CPU-safe)
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu \
    timeout 1200 python -m raptor_tpu.apps.profile_pretraining \
    --flops-only --out artifacts/profile_pretraining_r05.json \
    >> /tmp/profile_r05.log 2>&1
  echo "flops merge rc=$? $(date)"
fi

# ---- B: demo-seeded wave ---------------------------------------------------
if stage_ok 9000 wave_demo2500; then
  STAMP=/tmp/stamp_wave2500; touch "$STAMP"
  T0=$(date +%s)
  timeout $(( $(remaining) - 1800 > 9000 ? 9000 : $(remaining) - 1800 )) \
    python -m raptor_tpu.apps.pre_training \
    --population 128 --super-steps 6000 --steps-per-call 10 \
    --replay-capacity 1536 --seed 2500 --checkpoint-every 500 \
    --sample-rows --init-angle-power 3 \
    --demo-seed-steps 48 --demo-every 1 \
    > /tmp/pretrain_demo2500.log 2>&1
  echo "wave demo2500 rc=$? wall=$(( $(date +%s) - T0 ))s $(date)"
  # ownership check (ADVICE r4): only manifests newer than the wave start
  M=$(find experiments -name checkpoints.txt -newer "$STAMP" \
      -path '*pre_training*' 2>/dev/null | xargs -r ls -t | head -1)
  if [ -n "$M" ]; then
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu \
      timeout 1800 python -m raptor_tpu.apps.pack_teachers pack "$M" \
      artifacts/teachers_demo2500_30M.npz > /tmp/pack_demo2500.log 2>&1
    echo "pack rc=$? $(date)"
    if stage_ok 1800 eval_teachers_demo2500; then
      timeout 1800 python -m raptor_tpu.apps.eval_teachers \
        artifacts/teachers_demo2500_30M.npz \
        --out artifacts/eval_teachers_demo2500.json \
        > /tmp/eval_teachers_demo2500.log 2>&1
      echo "eval_teachers rc=$? $(date)"
    fi
  else
    echo "NO manifest owned by this wave — skipping pack"
  fi
fi

# ---- D: RL fine-tune from the best committed student ----------------------
BEST=$(env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu \
  python - <<'EOF'
import glob, json, os
best, score = "artifacts/student_currP4.h5", -1.0
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
                best, score = ck, s
print(best)
EOF
)
echo "fine-tune init: $BEST"
if stage_ok 6000 gru_ft; then
  STAMP=/tmp/stamp_gruft; touch "$STAMP"
  timeout $(( $(remaining) - 1200 > 6000 ? 6000 : $(remaining) - 1200 )) \
    python -m raptor_tpu.apps.train_gru_sac \
    --n-envs 1024 --super-steps 400 --rollout-length 64 \
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
    if stage_ok 1800 eval_parity_gruft; then
      timeout 1800 python -m raptor_tpu.apps.eval_parity \
        --checkpoint artifacts/student_gruft_r05.h5 \
        --out artifacts/eval_parity_gruft_r05.json \
        > /tmp/eval_parity_gruft.log 2>&1
      echo "eval_parity gruft rc=$? $(date)"
    fi
  fi
fi

touch /tmp/r05_session2_done
echo "=== session2 chain done, TPU idle $(date) ==="
