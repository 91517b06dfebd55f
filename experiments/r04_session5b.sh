#!/bin/bash
# Session-5 chain v2: recovery after the watchdog mis-kill of wave 1500
# (stale-run-dir bug, fixed in wave_watchdog2.sh). Adopts the running
# wave-1600 python, then serializes the rest of the session:
#   1. wait for wave 1600 -> pack (ownership-checked: only a manifest
#      written after the wave started)
#   2. rerun wave 1500 -> pack
#   3. K=1024 x 30.7M distill + eval_parity (VERDICT r3 item 6)
#   4. hidden-32 student capacity ablation + eval_parity
#   5. full pytest suite (CPU), bench_scaling regen, bench warm-up
# All deadline-gated; TPU idle before the round boundary.
set -u
cd /root/repo
END_TS=${1:?END_TS epoch}
W1600_PID=${2:?wave-1600 python pid}
W1600_START=${3:?wave-1600 start epoch}

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

pack_after() {  # pack_after <start_epoch> <pack_path>
  local M
  M=$(find experiments -name checkpoints.txt -path "*_pre_training*" \
      -newermt "@$1" 2>/dev/null | head -1)
  if [ -n "$M" ]; then
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu \
      timeout 1800 python -m raptor_tpu.apps.pack_teachers pack "$M" "$2" \
      >> /tmp/pack_waves_r04s5.log 2>&1
    echo "pack $2 rc=$? (manifest $M) $(date)"
  else
    echo "pack $2 SKIPPED: no manifest newer than $1"
  fi
}

run_distill() {  # run_distill <tag> <manifest> <extra flags...>
  local TAG=$1 MANIFEST=$2; shift 2
  timeout 2700 python -m raptor_tpu.apps.post_training "$MANIFEST" \
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
    if [ "$(remaining)" -gt 900 ]; then
      timeout 1800 python -m raptor_tpu.apps.eval_parity \
        --checkpoint "artifacts/student_${TAG}.h5" \
        --out "artifacts/eval_parity_${TAG}.json" \
        > "/tmp/eval_parity_${TAG}.log" 2>&1
      echo "eval_parity $TAG rc=$? $(date)"
    fi
  fi
}

# --- 1: adopt wave 1600 ---------------------------------------------
echo "=== adopting wave-1600 python $W1600_PID $(date) ==="
while kill -0 "$W1600_PID" 2>/dev/null; do sleep 20; done
echo "wave 1600 python exited $(date)"
pack_after "$W1600_START" artifacts/teachers_seed1600_30M.npz

# --- 2: rerun wave 1500 ----------------------------------------------
if stage_ok 3600 wave_1500_rerun; then
  T0=$(date +%s)
  timeout 4500 python -m raptor_tpu.apps.pre_training \
    --population 128 --super-steps 6000 --steps-per-call 10 \
    --replay-capacity 1536 --seed 1500 --checkpoint-every 500 \
    --sample-rows \
    > /tmp/pretrain_w1500.log 2>&1
  echo "wave 1500 rc=$? $(date)"
  pack_after "$T0" artifacts/teachers_seed1500_30M.npz
fi

# --- 3: K=1024 distill ------------------------------------------------
NPACKS=$(ls artifacts/teachers_seed*_30M.npz 2>/dev/null | grep -v 900row | wc -l)
if [ "$NPACKS" -ge 8 ] && stage_ok 2100 distill_1024; then
  ls artifacts/teachers_seed*_30M.npz | grep -v 900row | sort \
    > experiments/union1024_packs.txt
  run_distill 1024x30M experiments/union1024_packs.txt
else
  echo "union has $NPACKS packs"
fi

# --- 4: capacity ablation ---------------------------------------------
if stage_ok 1800 cap32; then
  run_distill cap32_collP4 experiments/union_r03_packs.txt \
    --collect-angle-power 4 --student-hidden 32
fi

# --- 5: host-side round close -----------------------------------------
if stage_ok 1500 pytest; then
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu \
    timeout 2400 python -m pytest tests/ -q \
    > /tmp/pytest_r04s5.log 2>&1
  echo "pytest rc=$? $(date): $(tail -1 /tmp/pytest_r04s5.log)"
fi
if stage_ok 600 bench_scaling; then
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu \
    timeout 900 python -m raptor_tpu.apps.bench_scaling \
    --out artifacts/bench_scaling.json > /tmp/bench_scaling_r04.log 2>&1
  echo "bench_scaling rc=$? $(date)"
fi
if stage_ok 300 bench_warm; then
  timeout "$(remaining)" python bench.py > /tmp/bench_r04_warm.json 2>/tmp/bench_r04_warm.err
  echo "bench rc=$? $(date)"
  tail -1 /tmp/bench_r04_warm.json
fi

touch /tmp/r04_session5_done
echo "=== session5b chain done, TPU idle $(date) ==="
