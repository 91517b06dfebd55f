#!/bin/bash
# Round-3 queue 2 (after r03_efficiency.sh):
#  C: shorter beta-mixing (3 rounds) — close the two earliest matched
#     checkpoints where run A still lagged the reference (2.4M/4.7M steps)
#  D: K=1 control for the loss-gap decomposition (VERDICT r2 item 2): one
#     teacher => no label-disagreement floor => the achievable fit should
#     approach the reference's 0.022 if the floor explains the gap
#  E: profile the population pre-training super-step (VERDICT r2 item 3)
set -u
cd /root/repo

while [ ! -f /tmp/r03_eff_done ]; do sleep 30; done

UNION=experiments/union384_packs.txt

echo "=== distill eff384C (mix3) start $(date) ==="
timeout 7200 python -m raptor_tpu.apps.post_training "$UNION" \
  --rounds 160 --envs-per-teacher 8 --teachers-per-round 118 \
  --aggregate-capacity 40960 --grad-steps-per-round 913 \
  --teacher-mix-rounds 3 --eval-max-angle 1.0 --eval-every-rounds 5 \
  --diagnostics --seed 0 \
  > /tmp/distill_eff384C.log 2>&1
echo "=== C done rc=$? $(date) ==="
STUDENT=$(grep -o "experiments/[^ ]*final\.h5" /tmp/distill_eff384C.log | tail -1)
if [ -n "$STUDENT" ] && [ -f "$STUDENT" ]; then
  RUN=$(dirname "$(dirname "$STUDENT")")
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu bash -c "
    cp '$STUDENT' artifacts/student_eff384C.h5 &&
    cp \$(ls '$RUN'/events.out.tfevents.* | head -1) artifacts/distill_eff384C.tfevents &&
    python -m raptor_tpu.apps.compare_baseline artifacts/distill_eff384C.tfevents \
      --out artifacts/compare_eff384C.md > artifacts/compare_eff384C.json" \
    >> /tmp/distill_eff384C.log 2>&1
fi
sleep 5

echo "=== K=1 control start $(date) ==="
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu \
  python - <<'EOF' >> /tmp/k1_prep.log 2>&1
import jax
from raptor_tpu.apps.pack_teachers import load_teacher_pack, save_teacher_pack
a, f = load_teacher_pack("artifacts/teachers_seed1000_30M.npz")
sl = lambda t: jax.tree.map(lambda x: x[0:1], t)
save_teacher_pack("/tmp/teacher_k1.npz", sl(a), sl(f))
print("k1 pack written")
EOF
timeout 7200 python -m raptor_tpu.apps.post_training /tmp/teacher_k1.npz \
  --rounds 160 --envs-per-teacher 944 \
  --aggregate-capacity 40960 --grad-steps-per-round 913 \
  --teacher-mix-rounds 10 --eval-max-angle 1.0 --eval-every-rounds 20 \
  --diagnostics --seed 0 \
  > /tmp/distill_k1.log 2>&1
echo "=== K=1 done rc=$? $(date) ==="
STUDENT=$(grep -o "experiments/[^ ]*final\.h5" /tmp/distill_k1.log | tail -1)
if [ -n "$STUDENT" ] && [ -f "$STUDENT" ]; then
  RUN=$(dirname "$(dirname "$STUDENT")")
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu bash -c "
    cp \$(ls '$RUN'/events.out.tfevents.* | head -1) artifacts/distill_k1_control.tfevents" \
    >> /tmp/distill_k1.log 2>&1
fi
sleep 5

echo "=== pre-training profile start $(date) ==="
timeout 10800 python -m raptor_tpu.apps.profile_pretraining \
  --out artifacts/profile_pretraining.json \
  > /tmp/profile_pretraining.log 2>&1
echo "=== profile done rc=$? $(date) ==="
touch /tmp/r03_queue2_done
