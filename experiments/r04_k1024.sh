#!/bin/bash
# Round-4 K-scaling grid completion (VERDICT r3 next item 6): two more
# K=128 x 30.7M waves (seeds 1500/1600) -> 8 committed packs = 1024
# teachers -> matched-budget distill + eval-parity sweep. Waves use
# --sample-rows (quality-gated by experiments/r04_gate_rowsample.sh).
# Launch AFTER the curriculum chain; requires /tmp/r04_k1024_go (manual
# confirmation that the row-sampling gate passed).
set -u
cd /root/repo

while [ ! -f /tmp/r04_curriculum_done ] || [ ! -f /tmp/r04_k1024_go ]; do
  sleep 60
done

for SEED in 1500 1600; do
  echo "=== wave seed $SEED start $(date) ==="
  timeout 5400 python -m raptor_tpu.apps.pre_training \
    --population 128 --super-steps 6000 --steps-per-call 10 \
    --replay-capacity 1536 --seed "$SEED" --checkpoint-every 500 \
    --sample-rows \
    > "/tmp/pretrain_w${SEED}.log" 2>&1
  echo "=== wave seed $SEED done rc=$? $(date) ==="
  M=$(ls -dt experiments/*/*_pre_training/checkpoints.txt | head -1)
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu \
    timeout 1800 python -m raptor_tpu.apps.pack_teachers pack "$M" \
    "artifacts/teachers_seed${SEED}_30M.npz" \
    >> /tmp/pack_waves_r04.log 2>&1 &
  sleep 15
done
wait

UNION=experiments/union1024_packs.txt
ls artifacts/teachers_seed*_30M.npz | grep -v 900row | sort > "$UNION"
echo "union: K=$((128 * $(wc -l < "$UNION")))"

echo "=== 1024x30M distill start $(date) ==="
timeout 3600 python -m raptor_tpu.apps.post_training "$UNION" \
  --rounds 160 --envs-per-teacher 8 --teachers-per-round 118 \
  --aggregate-capacity 40960 --grad-steps-per-round 913 \
  --teacher-mix-rounds 3 --eval-max-angle 1.0 --eval-every-rounds 5 \
  --diagnostics --seed 0 \
  > /tmp/distill_1024x30M.log 2>&1
RC=$?
echo "=== 1024 distill rc=$RC $(date) ==="
STUDENT=$(grep -o "experiments/[^ ]*final\.h5" /tmp/distill_1024x30M.log | tail -1)
if [ "$RC" -eq 0 ] && [ -n "$STUDENT" ] && [ -f "$STUDENT" ]; then
  RUN=$(dirname "$(dirname "$STUDENT")")
  cp "$STUDENT" artifacts/student_1024x30M.h5
  cp $(ls "$RUN"/events.out.tfevents.* | head -1) \
    artifacts/distill_1024x30M.tfevents || true
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu \
    python -m raptor_tpu.apps.compare_baseline \
    artifacts/distill_1024x30M.tfevents \
    --out artifacts/compare_1024x30M.md \
    > artifacts/compare_1024x30M.json 2>/dev/null
  timeout 5400 python -m raptor_tpu.apps.eval_parity \
    --checkpoint artifacts/student_1024x30M.h5 \
    --out artifacts/eval_parity_1024x30M.json \
    > /tmp/eval_parity_1024x30M.log 2>&1
  echo "=== 1024 eval_parity rc=$? $(date) ==="
fi
touch /tmp/r04_k1024_done
echo "=== r04 k1024 chain done $(date) ==="
