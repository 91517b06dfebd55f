#!/bin/bash
# Round-4 pi-start curriculum sweep (VERDICT r3 weak #2 / next item 2).
# Recoverability is ~100% at every init angle; budget and K are measured
# dead ends; the untried lever is the TRAINING init distribution. Sweep
# the collect init-severity exponent over the flagship_r03 packs (512 x
# 30.7M, union_r03_packs.txt) at the exact matched-budget recipe, then
# score each student on the eval-parity severity sweep.
# Targets: pi-start aggregate length >= 400/500 (best so far 298.6),
# held-out crazyflie pi >= 420/500 (349.6), eval-parity >= 495 @ <= 1.5%.
set -u
cd /root/repo

# serialize behind the gate chain (one TPU process at a time)
while [ ! -f /tmp/r04_gate_done ]; do sleep 60; done

for POWER in 2 4; do
  TAG="currP${POWER}"
  echo "=== distill $TAG start $(date) ==="
  timeout 3600 python -m raptor_tpu.apps.post_training \
    experiments/union_r03_packs.txt \
    --rounds 160 --envs-per-teacher 8 --teachers-per-round 118 \
    --aggregate-capacity 40960 --grad-steps-per-round 913 \
    --teacher-mix-rounds 3 --eval-max-angle 1.0 --eval-every-rounds 10 \
    --collect-angle-power "$POWER" --seed 0 \
    > "/tmp/distill_${TAG}.log" 2>&1
  RC=$?
  echo "=== distill $TAG rc=$RC $(date) ==="
  STUDENT=$(grep -o "experiments/[^ ]*final\.h5" "/tmp/distill_${TAG}.log" | tail -1)
  if [ "$RC" -eq 0 ] && [ -n "$STUDENT" ] && [ -f "$STUDENT" ]; then
    cp "$STUDENT" "artifacts/student_${TAG}.h5"
    RUN=$(dirname "$(dirname "$STUDENT")")
    cp $(ls "$RUN"/events.out.tfevents.* | head -1) \
      "artifacts/distill_${TAG}.tfevents" || true
    timeout 5400 python -m raptor_tpu.apps.eval_parity \
      --checkpoint "artifacts/student_${TAG}.h5" \
      --out "artifacts/eval_parity_${TAG}.json" \
      > "/tmp/eval_parity_${TAG}.log" 2>&1
    echo "=== eval_parity $TAG rc=$? $(date) ==="
  fi
  sleep 10
done

touch /tmp/r04_curriculum_done
echo "=== r04 curriculum chain done $(date) ==="
