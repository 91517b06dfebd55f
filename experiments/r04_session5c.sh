#!/bin/bash
# Session-5 chain v3 — the recovery-reward hypothesis test, slotted in
# after chain v2's TPU work (a supervisor cuts v2 at its pytest stage and
# execs this). Failure-mode probe finding (artifacts/failure_modes_
# currP4.json): 100% of pi-start terminations are bottom-of-box exits
# while righting at ~3.4 rad/s — ~10x slower than the 35 rad/s the
# termination bound allows, because the teachers' |w|^2 + action
# penalties price out the fast flip. Teachers retrained with those two
# weights cut 10x (task weights unchanged) should learn the fast flip;
# DAgger transfers actions only, so the student is still scored on the
# standard reward. Half budget (15.4M) is enough for the diagnostic:
# compare eval_teachers (STANDARD env) vs the severity pack's 36.1%
# full-attitude termination.
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

if stage_ok 2100 recovery_wave; then
  T0=$(date +%s)
  timeout 2700 python -m raptor_tpu.apps.pre_training \
    --population 128 --super-steps 3000 --steps-per-call 10 \
    --replay-capacity 1536 --seed 2100 --checkpoint-every 500 \
    --sample-rows --init-angle-power 3 \
    --angular-velocity-weight 0.0005 --action-weight 0.01 \
    > /tmp/pretrain_rec2100.log 2>&1
  echo "recovery wave rc=$? $(date)"
  M=$(find experiments -name checkpoints.txt -path "*_pre_training*" \
      -newermt "@$T0" 2>/dev/null | head -1)
  if [ -n "$M" ]; then
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu \
      timeout 900 python -m raptor_tpu.apps.pack_teachers pack "$M" \
      artifacts/teachers_rec2100_15M.npz >> /tmp/pack_waves_r04s5.log 2>&1
    echo "pack rec2100 rc=$? $(date)"
  fi
  if [ -f artifacts/teachers_rec2100_15M.npz ] && stage_ok 600 eval_rec_teachers; then
    timeout 1200 python -m raptor_tpu.apps.eval_teachers \
      artifacts/teachers_rec2100_15M.npz \
      --out artifacts/eval_teachers_rec2100.json \
      > /tmp/eval_teachers_rec2100.log 2>&1
    echo "eval_teachers rec2100 rc=$? $(date)"
  fi
fi

# optional: if the evening ran ahead of schedule, distill the shaped
# teachers immediately (K=128 alone, severity collect) and sweep — the
# first student whose labels contain fast flips. Gated to always leave
# room for pytest + bench_scaling.
if [ -f artifacts/teachers_rec2100_15M.npz ] && stage_ok 4200 distill_rec128; then
  echo "artifacts/teachers_rec2100_15M.npz" > experiments/gate_rec2100.txt
  timeout 2400 python -m raptor_tpu.apps.post_training \
    experiments/gate_rec2100.txt \
    --rounds 160 --envs-per-teacher 8 --teachers-per-round 118 \
    --aggregate-capacity 40960 --grad-steps-per-round 913 \
    --teacher-mix-rounds 3 --eval-max-angle 1.0 --eval-every-rounds 10 \
    --collect-angle-power 2 --seed 0 \
    > /tmp/distill_rec128.log 2>&1
  RC=$?
  echo "distill rec128 rc=$RC $(date)"
  STUDENT=$(grep -o "experiments/[^ ]*final\.h5" /tmp/distill_rec128.log | tail -1)
  if [ "$RC" -eq 0 ] && [ -n "$STUDENT" ] && [ -f "$STUDENT" ]; then
    cp "$STUDENT" artifacts/student_rec128_collP2.h5
    RUN=$(dirname "$(dirname "$STUDENT")")
    cp $(ls "$RUN"/events.out.tfevents.* | head -1) \
      artifacts/distill_rec128_collP2.tfevents || true
    if [ "$(remaining)" -gt 2600 ]; then
      timeout 1500 python -m raptor_tpu.apps.eval_parity \
        --checkpoint artifacts/student_rec128_collP2.h5 \
        --out artifacts/eval_parity_rec128_collP2.json \
        > /tmp/eval_parity_rec128.log 2>&1
      echo "eval_parity rec128 rc=$? $(date)"
    fi
  fi
fi

if stage_ok 1400 pytest; then
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu \
    timeout 2400 python -m pytest tests/ -q \
    > /tmp/pytest_r04s5.log 2>&1
  echo "pytest rc=$? $(date): $(tail -1 /tmp/pytest_r04s5.log)"
fi

if stage_ok 500 bench_scaling; then
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu \
    timeout 900 python -m raptor_tpu.apps.bench_scaling \
    --out artifacts/bench_scaling.json > /tmp/bench_scaling_r04.log 2>&1
  echo "bench_scaling rc=$? $(date)"
fi

# bench only with real headroom: `timeout` killing bench.py would orphan
# its in-flight TPU subprocess past the round boundary (one-process rule)
if stage_ok 3600 bench_warm; then
  timeout "$(remaining)" python bench.py > /tmp/bench_r04_warm.json 2>/tmp/bench_r04_warm.err
  echo "bench rc=$? $(date)"
  tail -1 /tmp/bench_r04_warm.json
fi

touch /tmp/r04_session5_done
echo "=== session5c chain done, TPU idle $(date) ==="
