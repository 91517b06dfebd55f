#!/bin/bash
# Round-3 item 1 (VERDICT r2): match the reference's sample efficiency.
# The reference collects ~470k env-steps/round x 160 rounds = 75.3M total
# (BASELINE.md); round 2's flagship collected 2.56M/round (5.4x) and only
# won at the endpoint. These runs match the reference budget by collecting
# from a random 118-teacher subset each round (118 x 8 envs x 500 steps =
# 472k/round, 75.5M total) over the committed 384x30.7M-step population.
#   Run A: subsampling only          Run B: + observation standardization
# Both log diagnostics/* (loss decomposition, VERDICT r2 item 2).
set -u
cd /root/repo

UNION=experiments/union384_packs.txt
printf '%s\n' artifacts/teachers_seed1000_30M.npz \
              artifacts/teachers_seed1100_30M.npz \
              artifacts/teachers_seed1200_30M.npz > "$UNION"

run_one () {  # $1 = tag, $2.. = extra post_training flags
  local TAG=$1; shift
  echo "=== distill $TAG start $(date) ==="
  timeout 10800 python -m raptor_tpu.apps.post_training "$UNION" \
    --rounds 160 --envs-per-teacher 8 --teachers-per-round 118 \
    --aggregate-capacity 40960 --grad-steps-per-round 913 \
    --teacher-mix-rounds 10 --eval-max-angle 1.0 --eval-every-rounds 5 \
    --diagnostics --seed 0 "$@" \
    > "/tmp/distill_$TAG.log" 2>&1
  local RC=$?
  echo "=== distill $TAG done rc=$RC $(date) ==="
  local STUDENT
  STUDENT=$(grep -o "experiments/[^ ]*final\.h5" "/tmp/distill_$TAG.log" | tail -1)
  if [ "$RC" -ne 0 ] || [ -z "$STUDENT" ] || [ ! -f "$STUDENT" ]; then
    echo "distill $TAG FAILED (rc=$RC student='$STUDENT')"; return 1
  fi
  local RUN
  RUN=$(dirname "$(dirname "$STUDENT")")
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu bash -c "
    cp '$STUDENT' 'artifacts/student_$TAG.h5' &&
    cp \$(ls '$RUN'/events.out.tfevents.* | head -1) 'artifacts/distill_$TAG.tfevents' &&
    python -m raptor_tpu.apps.compare_baseline 'artifacts/distill_$TAG.tfevents' \
      --out 'artifacts/compare_$TAG.md' > 'artifacts/compare_$TAG.json'" \
    >> "/tmp/distill_$TAG.log" 2>&1
  echo "exports $TAG rc=$?"
  sleep 5
}

run_one eff384A
run_one eff384B --standardize

touch /tmp/r03_eff_done
echo "=== r03 efficiency runs done $(date) ==="
