#!/bin/bash
# Round-2 evening TPU queue: runs after the big distillation finishes.
# 1. eval-parity sweep scoring the new student vs the shipped policy
# 2. matched-env-steps comparison report vs the reference tfevents
# 3. export the student in both firmware header formats
# 4. BPTT-SAC demonstration run on TPU (VERDICT r1 item 7)
set -u
cd /root/repo
while [ ! -f /tmp/big_distill_done ]; do sleep 30; done
sleep 15
mkdir -p artifacts

RUN=$(ls -d experiments/*/*_post_training | sort | tail -1)
STUDENT="$RUN/checkpoints/final.h5"
EVENTS=$(ls "$RUN"/events.out.tfevents.* | head -1)
echo "student: $STUDENT"

echo "=== eval_parity $(date) ==="
timeout 5400 python -m raptor_tpu.apps.eval_parity \
  --checkpoint "$STUDENT" --out artifacts/eval_parity_r02.json \
  > /tmp/eval_parity_r02.log 2>&1
echo "rc=$?"
sleep 10

echo "=== compare_baseline $(date) ==="
timeout 900 env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu \
  python -m raptor_tpu.apps.compare_baseline "$EVENTS" \
  --out artifacts/compare_r02.md > artifacts/compare_r02.json 2>/tmp/compare_r02.log
echo "rc=$?"

echo "=== export headers $(date) ==="
timeout 900 env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu bash -c "
  python -m raptor_tpu.apps.export_policy '$STUDENT' artifacts/student_r02_policy.h --format raptor &&
  python -m raptor_tpu.apps.export_policy '$STUDENT' artifacts/student_r02_rltools_checkpoint.h --format rltools" \
  > /tmp/export_r02.log 2>&1
echo "rc=$?"
cp "$STUDENT" artifacts/student_640teachers.h5 2>/dev/null
sleep 10

echo "=== train_gru_sac TPU demo $(date) ==="
timeout 4500 python -m raptor_tpu.apps.train_gru_sac \
  --n-envs 256 --super-steps 1500 --steps-per-call 10 --seed 0 \
  > /tmp/gru_sac_tpu.log 2>&1
echo "rc=$?"
touch /tmp/evening_done
echo "=== evening queue done $(date) ==="
