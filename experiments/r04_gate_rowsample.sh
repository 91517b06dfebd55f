#!/bin/bash
# Round-4 quality gate for row-contiguous replay sampling (VERDICT r3
# weak #1 / next-round item 1). Paired with the committed round-3 wave
# seed 900 (same seed -> same airframes, same budget 128 x 30.7M):
#   1. re-train wave seed 900 WITH --sample-rows (measured 1.88x:
#      0.0687 -> 0.0366 s/super-step, artifacts/profile_rowsample.json)
#   2. eval both teacher packs under the identical eval program
#   3. matched-recipe distill from each pack -> eval-parity students
# Pass = wave <= 52 min warm AND teacher return distribution equal AND
# student stats equal-or-better.
set -u
cd /root/repo

echo "=== eval committed seed900 pack $(date) ==="
timeout 3600 python -m raptor_tpu.apps.eval_teachers \
  artifacts/teachers_seed900_30M.npz \
  --out artifacts/eval_teachers_seed900_f32.json \
  > /tmp/eval_teachers_900.log 2>&1
echo "rc=$?"

echo "=== wave seed 900 --sample-rows start $(date) ==="
T0=$(date +%s)
timeout 5400 python -m raptor_tpu.apps.pre_training \
  --population 128 --super-steps 6000 --steps-per-call 10 \
  --replay-capacity 1536 --seed 900 --checkpoint-every 500 \
  --sample-rows \
  > /tmp/pretrain_w900row.log 2>&1
RC=$?
T1=$(date +%s)
echo "=== wave done rc=$RC wall=$((T1-T0))s $(date) ==="

M=$(ls -dt experiments/*/*_pre_training/checkpoints.txt | head -1)
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu \
  timeout 1800 python -m raptor_tpu.apps.pack_teachers pack "$M" \
  "artifacts/teachers_seed900row_30M.npz" \
  > /tmp/pack_w900row.log 2>&1
echo "pack rc=$?"

echo "=== eval rows pack $(date) ==="
timeout 1800 python -m raptor_tpu.apps.eval_teachers \
  artifacts/teachers_seed900row_30M.npz \
  --out artifacts/eval_teachers_seed900_rows.json \
  > /tmp/eval_teachers_900row.log 2>&1
echo "rc=$?"

# paired matched-recipe distills (reference budget recipe, K=128 pack)
for PACK in teachers_seed900_30M teachers_seed900row_30M; do
  echo "=== distill from $PACK start $(date) ==="
  echo "artifacts/${PACK}.npz" > "experiments/gate_${PACK}.txt"
  timeout 3600 python -m raptor_tpu.apps.post_training \
    "experiments/gate_${PACK}.txt" \
    --rounds 160 --envs-per-teacher 8 --teachers-per-round 118 \
    --aggregate-capacity 40960 --grad-steps-per-round 913 \
    --teacher-mix-rounds 3 --eval-max-angle 1.0 --eval-every-rounds 10 \
    --seed 0 \
    > "/tmp/distill_gate_${PACK}.log" 2>&1
  echo "=== distill $PACK rc=$? $(date) ==="
  sleep 10
done

touch /tmp/r04_gate_done
echo "=== r04 gate chain done $(date) ==="
