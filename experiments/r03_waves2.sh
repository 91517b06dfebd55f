#!/bin/bash
# Round-3 extension: waves 1300/1400 (K=128 x 30.7M, unrolled inner loop)
# -> 768x30.7M committed population -> matched-budget distill + eval-parity.
# Targets VERDICT r2 item 5's robustness bar (pi-start episode length) via
# the measured lever: population size.
set -u
cd /root/repo

for SEED in 1300 1400; do
  echo "=== wave seed $SEED start $(date) ==="
  timeout 8100 python -m raptor_tpu.apps.pre_training \
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

UNION=experiments/union768_packs.txt
ls artifacts/teachers_seed*_30M.npz | sort > "$UNION"
echo "union: K=$((128 * $(wc -l < "$UNION")))"

echo "=== 768x30M distill start $(date) ==="
timeout 7200 python -m raptor_tpu.apps.post_training "$UNION" \
  --rounds 160 --envs-per-teacher 8 --teachers-per-round 118 \
  --aggregate-capacity 40960 --grad-steps-per-round 913 \
  --teacher-mix-rounds 3 --eval-max-angle 1.0 --eval-every-rounds 5 \
  --diagnostics --seed 0 \
  > /tmp/distill_768.log 2>&1
RC=$?
echo "=== 768 distill rc=$RC $(date) ==="
STUDENT=$(grep -o "experiments/[^ ]*final\.h5" /tmp/distill_768.log | tail -1)
if [ "$RC" -eq 0 ] && [ -n "$STUDENT" ] && [ -f "$STUDENT" ]; then
  RUN=$(dirname "$(dirname "$STUDENT")")
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu bash -c "
    cp '$STUDENT' artifacts/student_768x30M.h5 &&
    cp \$(ls '$RUN'/events.out.tfevents.* | head -1) artifacts/distill_768x30M.tfevents &&
    python -m raptor_tpu.apps.compare_baseline artifacts/distill_768x30M.tfevents \
      --out artifacts/compare_768x30M.md > artifacts/compare_768x30M.json" \
    >> /tmp/distill_768.log 2>&1
  sleep 5
  timeout 5400 python -m raptor_tpu.apps.eval_parity \
    --checkpoint artifacts/student_768x30M.h5 \
    --out artifacts/eval_parity_768x30M.json \
    > /tmp/eval_parity_768.log 2>&1
  echo "=== 768 eval_parity rc=$? $(date) ==="
fi
touch /tmp/r03_waves2_done
echo "=== waves2 done $(date) ==="
