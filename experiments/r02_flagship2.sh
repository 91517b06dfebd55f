#!/bin/bash
# Flagship v2: regenerate the teacher population LOST to the inter-round
# reimage, at the doubled per-teacher budget the teacher-quality ablation
# validated (30.7M env-steps; NOTES.md round-2 late findings), and distill
# at reference scale. 4 waves x K=128 = 512 teachers. Each wave is packed
# to artifacts/*.npz immediately so the population survives future
# reimages (committed from the driving session as packs appear).
set -u
cd /root/repo

for SEED in 900 1000 1100 1200; do
  echo "=== wave seed $SEED start $(date) ==="
  timeout 12600 python -m raptor_tpu.apps.pre_training \
    --population 128 --super-steps 6000 --steps-per-call 10 \
    --replay-capacity 1536 --seed "$SEED" \
    > "/tmp/pretrain_w${SEED}.log" 2>&1
  echo "=== wave seed $SEED done rc=$? $(date) ==="
  M=$(ls -d experiments/*/*_pre_training/checkpoints.txt | sort | tail -1)
  # pack on CPU (isolated: cannot touch the tunnel) while TPU moves on
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu \
    timeout 1800 python -m raptor_tpu.apps.pack_teachers pack "$M" \
    "artifacts/teachers_seed${SEED}_30M.npz" \
    >> /tmp/pack_waves.log 2>&1 &
  sleep 10
done
wait

UNION=experiments/union512_checkpoints.txt
: > "$UNION"
for M in experiments/*/*_pre_training/checkpoints.txt; do
  [ "$(wc -l < "$M")" -eq 128 ] && cat "$M" >> "$UNION"
done
echo "union teachers: $(wc -l < "$UNION")"
touch /tmp/waves512_done

echo "=== 512x30M distillation start $(date) ==="
timeout 14400 python -m raptor_tpu.apps.post_training "$UNION" \
  --rounds 160 --envs-per-teacher 10 \
  --aggregate-capacity 40960 --grad-steps-per-round 913 \
  --teacher-mix-rounds 40 --eval-max-angle 1.0 --eval-every-rounds 5 \
  --seed 0 \
  > /tmp/distill512x30M.log 2>&1
DISTILL_RC=$?
echo "=== distillation done rc=$DISTILL_RC $(date) ==="
sleep 10

STUDENT=$(grep -o "experiments/[^ ]*final\.h5" /tmp/distill512x30M.log | tail -1)
if [ "$DISTILL_RC" -ne 0 ] || [ -z "$STUDENT" ] || [ ! -f "$STUDENT" ]; then
  echo "distillation FAILED (rc=$DISTILL_RC student='$STUDENT')"
  touch /tmp/flagship2_done
  exit 1
fi
RUN=$(dirname "$(dirname "$STUDENT")")
echo "student: $STUDENT"
timeout 5400 python -m raptor_tpu.apps.eval_parity \
  --checkpoint "$STUDENT" --out artifacts/eval_parity_512x30M.json \
  > /tmp/eval_parity_512x30M.log 2>&1
echo "eval_parity rc=$?"
sleep 10

env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu bash -c "
  cp '$STUDENT' artifacts/student_512x30M.h5 &&
  cp \$(ls '$RUN'/events.out.tfevents.* | head -1) artifacts/distill_512x30M.tfevents &&
  python -m raptor_tpu.apps.compare_baseline artifacts/distill_512x30M.tfevents --out artifacts/compare_512x30M.md > artifacts/compare_512x30M.json" \
  > /tmp/flagship2_exports.log 2>&1
echo "exports rc=$?"
touch /tmp/flagship2_done
echo "=== flagship2 done $(date) ==="
