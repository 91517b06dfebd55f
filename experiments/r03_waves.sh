#!/bin/bash
# Round-3 main TPU chain:
#  1. eval-parity sweep of the matched-budget student (eff384C)
#  2. teacher waves seeds 900/1300/1400 (K=128 x 30.7M, warm ~1.5h each,
#     periodic exports every 500 super-steps = hang insurance), each packed
#     to a committable .npz as it finishes
#  3. flagship distill over ALL packs with the round-3 recipe
#     (teachers-per-round 118, mix 3) + eval-parity + compare
#  4. BPTT-SAC on the eval-parity protocol (VERDICT r2 item 8)
set -u
cd /root/repo

echo "=== eval_parity eff384C start $(date) ==="
timeout 5400 python -m raptor_tpu.apps.eval_parity \
  --checkpoint artifacts/student_eff384C.h5 \
  --out artifacts/eval_parity_eff384C.json \
  > /tmp/eval_parity_eff384C.log 2>&1
echo "=== eval_parity eff384C rc=$? $(date) ==="
sleep 5

for SEED in 900 1300 1400; do
  # stop starting new waves late enough that the flagship still fits
  if [ -f /tmp/r03_stop_waves ]; then echo "wave $SEED skipped (stop marker)"; break; fi
  echo "=== wave seed $SEED start $(date) ==="
  timeout 9000 python -m raptor_tpu.apps.pre_training \
    --population 128 --super-steps 6000 --steps-per-call 10 \
    --replay-capacity 1536 --seed "$SEED" --checkpoint-every 500 \
    > "/tmp/pretrain_w${SEED}.log" 2>&1
  echo "=== wave seed $SEED done rc=$? $(date) ==="
  M=$(ls -dt experiments/*/*_pre_training/checkpoints.txt | head -1)
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu \
    timeout 1800 python -m raptor_tpu.apps.pack_teachers pack "$M" \
    "artifacts/teachers_seed${SEED}_30M.npz" \
    >> /tmp/pack_waves_r03.log 2>&1 &
  sleep 15
done
wait

UNION=experiments/union_r03_packs.txt
ls artifacts/teachers_seed*_30M.npz | sort > "$UNION"
K_TOTAL=$((128 * $(wc -l < "$UNION")))
echo "union packs: $(cat "$UNION" | tr '\n' ' ') => K=$K_TOTAL"

echo "=== flagship distill K=$K_TOTAL x30M start $(date) ==="
timeout 10800 python -m raptor_tpu.apps.post_training "$UNION" \
  --rounds 160 --envs-per-teacher 8 --teachers-per-round 118 \
  --aggregate-capacity 40960 --grad-steps-per-round 913 \
  --teacher-mix-rounds 3 --eval-max-angle 1.0 --eval-every-rounds 5 \
  --diagnostics --seed 0 \
  > /tmp/distill_flagship_r03.log 2>&1
RC=$?
echo "=== flagship done rc=$RC $(date) ==="
STUDENT=$(grep -o "experiments/[^ ]*final\.h5" /tmp/distill_flagship_r03.log | tail -1)
if [ "$RC" -eq 0 ] && [ -n "$STUDENT" ] && [ -f "$STUDENT" ]; then
  RUN=$(dirname "$(dirname "$STUDENT")")
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu bash -c "
    cp '$STUDENT' 'artifacts/student_flagship_r03.h5' &&
    cp \$(ls '$RUN'/events.out.tfevents.* | head -1) artifacts/distill_flagship_r03.tfevents &&
    python -m raptor_tpu.apps.compare_baseline artifacts/distill_flagship_r03.tfevents \
      --out artifacts/compare_flagship_r03.md > artifacts/compare_flagship_r03.json" \
    >> /tmp/distill_flagship_r03.log 2>&1
  sleep 5
  timeout 5400 python -m raptor_tpu.apps.eval_parity \
    --checkpoint artifacts/student_flagship_r03.h5 \
    --out artifacts/eval_parity_flagship_r03.json \
    > /tmp/eval_parity_flagship_r03.log 2>&1
  echo "=== flagship eval_parity rc=$? $(date) ==="
fi
sleep 5

echo "=== BPTT-SAC eval-parity run start $(date) ==="
timeout 7200 python -m raptor_tpu.apps.train_gru_sac \
  --n-envs 1024 --super-steps 380 --rollout-length 64 --steps-per-call 10 \
  --gradient-steps 8 --batch-size 64 --seq-len 64 \
  --eval-every 20 --eval-max-angle 1.0 --seed 0 \
  > /tmp/gru_sac_r03.log 2>&1
echo "=== BPTT-SAC done rc=$? $(date) ==="
GRU=$(grep -o "experiments/[^ ]*\.h5" /tmp/gru_sac_r03.log | tail -1)
if [ -n "$GRU" ] && [ -f "$GRU" ]; then
  RUN=$(dirname "$(dirname "$GRU")")
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu bash -c "
    cp '$GRU' artifacts/gru_sac_r03.h5 &&
    cp \$(ls '$RUN'/events.out.tfevents.* | head -1) artifacts/gru_sac_r03.tfevents" \
    >> /tmp/gru_sac_r03.log 2>&1
  timeout 5400 python -m raptor_tpu.apps.eval_parity \
    --checkpoint artifacts/gru_sac_r03.h5 \
    --out artifacts/eval_parity_gru_sac_r03.json \
    > /tmp/eval_parity_gru_sac.log 2>&1
  echo "=== gru_sac eval_parity rc=$? $(date) ==="
fi
touch /tmp/r03_waves_done
echo "=== r03 chain done $(date) ==="
