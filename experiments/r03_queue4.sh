#!/bin/bash
# Round-3 queue 4 (after the main chain touches /tmp/r03_waves_done):
#  1. validate the multi-step unroll fix on real TPU (profile variants)
#  2. half-budget distill: beat the reference's final stats in 37.8M steps
#  3. robustness run: 320 rounds x 472k = 151M steps over all packs,
#     gunning for pi-start episode length > 310 (VERDICT r2 item 5 bar)
#  4. scaling-harness artifact run (CPU-isolated, while TPU cools down)
set -u
cd /root/repo

while [ ! -f /tmp/r03_waves_done ]; do sleep 60; done

echo "=== unroll validation start $(date) ==="
timeout 3600 python -m raptor_tpu.apps.profile_pretraining \
  --variants k128_full,k128_unroll10 \
  --out artifacts/profile_unroll.json \
  > /tmp/profile_unroll.log 2>&1
echo "=== unroll validation rc=$? $(date) ==="
sleep 5

UNION=experiments/union_r03_packs.txt
[ -s "$UNION" ] || ls artifacts/teachers_seed*_30M.npz | sort > "$UNION"

echo "=== half-budget distill start $(date) ==="
timeout 5400 python -m raptor_tpu.apps.post_training "$UNION" \
  --rounds 80 --envs-per-teacher 8 --teachers-per-round 118 \
  --aggregate-capacity 40960 --grad-steps-per-round 913 \
  --teacher-mix-rounds 3 --eval-max-angle 1.0 --eval-every-rounds 5 \
  --seed 0 \
  > /tmp/distill_half.log 2>&1
echo "=== half-budget rc=$? $(date) ==="
STUDENT=$(grep -o "experiments/[^ ]*final\.h5" /tmp/distill_half.log | tail -1)
if [ -n "$STUDENT" ] && [ -f "$STUDENT" ]; then
  RUN=$(dirname "$(dirname "$STUDENT")")
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu bash -c "
    cp \$(ls '$RUN'/events.out.tfevents.* | head -1) artifacts/distill_half_budget.tfevents &&
    python -m raptor_tpu.apps.compare_baseline artifacts/distill_half_budget.tfevents \
      --out artifacts/compare_half_budget.md > artifacts/compare_half_budget.json" \
    >> /tmp/distill_half.log 2>&1
fi
sleep 5

echo "=== robustness-320 distill start $(date) ==="
timeout 7200 python -m raptor_tpu.apps.post_training "$UNION" \
  --rounds 320 --envs-per-teacher 8 --teachers-per-round 118 \
  --aggregate-capacity 40960 --grad-steps-per-round 913 \
  --teacher-mix-rounds 3 --eval-max-angle 1.0 --eval-every-rounds 10 \
  --seed 0 \
  > /tmp/distill_320.log 2>&1
echo "=== robustness-320 rc=$? $(date) ==="
STUDENT=$(grep -o "experiments/[^ ]*final\.h5" /tmp/distill_320.log | tail -1)
if [ -n "$STUDENT" ] && [ -f "$STUDENT" ]; then
  RUN=$(dirname "$(dirname "$STUDENT")")
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu bash -c "
    cp '$STUDENT' artifacts/student_robust320.h5 &&
    cp \$(ls '$RUN'/events.out.tfevents.* | head -1) artifacts/distill_robust320.tfevents" \
    >> /tmp/distill_320.log 2>&1
  timeout 5400 python -m raptor_tpu.apps.eval_parity \
    --checkpoint artifacts/student_robust320.h5 \
    --out artifacts/eval_parity_robust320.json \
    > /tmp/eval_parity_robust320.log 2>&1
  echo "=== robustness-320 eval_parity rc=$? $(date) ==="
fi

echo "=== bench_scaling artifact run (CPU) start $(date) ==="
timeout 3600 python -m raptor_tpu.apps.bench_scaling \
  --out artifacts/bench_scaling.json > /tmp/bench_scaling.log 2>&1
echo "=== bench_scaling rc=$? $(date) ==="
touch /tmp/r03_queue4_done
echo "=== queue4 done $(date) ==="
