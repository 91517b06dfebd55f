#!/bin/bash
# Teacher-quality ceiling experiment (round-1 VERDICT missing item 3):
# round-1 teachers stopped at 15.4M env-steps with eval returns still
# climbing. Train one K=128 wave at DOUBLE the budget (super-steps 6000 =
# 30.7M steps/teacher), then distill it and the matched 15.4M wave (seed
# 100) with an identical recipe; the paired students isolate the effect of
# teacher training budget on student quality.
set -u
cd /root/repo
while [ ! -f /tmp/final_bench_done ]; do sleep 60; done
sleep 15

echo "=== long wave (seed 800, 30.7M steps/teacher) $(date) ==="
timeout 10800 python -m raptor_tpu.apps.pre_training \
  --population 128 --super-steps 6000 --steps-per-call 10 \
  --replay-capacity 1536 --seed 800 \
  > /tmp/pretrain_wave_seed800.log 2>&1
echo "long wave rc=$?"
sleep 20

LONG=$(ls -d experiments/*/*_pre_training/checkpoints.txt | sort | tail -1)
SHORT=experiments/2026-08-17_11-29-03/2026-08-17_11-29-03_pre_training/checkpoints.txt
echo "long manifest: $LONG"

for PAIR in "long:$LONG" "short:$SHORT"; do
  NAME="${PAIR%%:*}"; MANIFEST="${PAIR#*:}"
  echo "=== distill $NAME teachers $(date) ==="
  timeout 7200 python -m raptor_tpu.apps.post_training "$MANIFEST" \
    --rounds 80 --envs-per-teacher 8 \
    --aggregate-capacity 20480 --grad-steps-per-round 913 \
    --teacher-mix-rounds 20 --eval-max-angle 1.0 --eval-every-rounds 5 \
    --seed 0 \
    > "/tmp/distill_${NAME}_teachers.log" 2>&1
  RC=$?
  echo "distill $NAME rc=$RC"
  S=$(grep -o "experiments/[^ ]*final\.h5" "/tmp/distill_${NAME}_teachers.log" | tail -1)
  if [ "$RC" -eq 0 ] && [ -n "$S" ] && [ -f "$S" ]; then
    RUN=$(dirname "$(dirname "$S")")
    cp "$(ls "$RUN"/events.out.tfevents.* | head -1)" \
       "artifacts/distill_${NAME}128_teachers.tfevents"
  fi
  sleep 20
done
touch /tmp/teacher_quality_done
echo "=== teacher quality experiment done $(date) ==="
