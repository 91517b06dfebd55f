#!/bin/bash
# Round-4 severity-teacher experiment (the pi-start ceiling hypothesis).
# Measured: uniform-init teachers terminate ~39% on full-attitude starts
# (artifacts/eval_teachers_seed900_rows.json) — the distilled student's
# pi-start ceiling is teacher incompetence at severe attitudes, which no
# collect-side curriculum can fix. Train a K=128 wave whose OWN training
# init oversamples severe starts (--init-angle-power 3), evaluate the
# teachers, then distill severity teachers + severity collect and sweep.
set -u
cd /root/repo

while [ ! -f /tmp/r04_curriculum_done ]; do sleep 60; done

echo "=== severity wave seed 2000 start $(date) ==="
T0=$(date +%s)
timeout 5400 python -m raptor_tpu.apps.pre_training \
  --population 128 --super-steps 6000 --steps-per-call 10 \
  --replay-capacity 1536 --seed 2000 --checkpoint-every 500 \
  --sample-rows --init-angle-power 3 \
  > /tmp/pretrain_sev2000.log 2>&1
echo "=== severity wave rc=$? wall=$(( $(date +%s) - T0 ))s $(date) ==="

M=$(ls -dt experiments/*/*_pre_training/checkpoints.txt | head -1)
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu \
  timeout 1800 python -m raptor_tpu.apps.pack_teachers pack "$M" \
  "artifacts/teachers_sev2000_30M.npz" \
  > /tmp/pack_sev2000.log 2>&1
echo "pack rc=$?"

timeout 1800 python -m raptor_tpu.apps.eval_teachers \
  artifacts/teachers_sev2000_30M.npz \
  --out artifacts/eval_teachers_sev2000.json \
  > /tmp/eval_teachers_sev2000.log 2>&1
echo "eval_teachers rc=$?"

# distill: severity teachers alone (K=128) with the best collect
# curriculum so far; compare against the K=128 gate distill baselines
echo "artifacts/teachers_sev2000_30M.npz" > experiments/gate_sev2000.txt
for POWER in 2; do
  TAG="sevT_collP${POWER}"
  echo "=== distill $TAG start $(date) ==="
  timeout 3600 python -m raptor_tpu.apps.post_training \
    experiments/gate_sev2000.txt \
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
    timeout 5400 python -m raptor_tpu.apps.eval_parity \
      --checkpoint "artifacts/student_${TAG}.h5" \
      --out "artifacts/eval_parity_${TAG}.json" \
      > "/tmp/eval_parity_${TAG}.log" 2>&1
    echo "=== eval_parity $TAG rc=$? $(date) ==="
  fi
done

touch /tmp/r04_severity_done
echo "=== r04 severity chain done $(date) ==="
