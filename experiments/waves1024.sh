#!/bin/bash
# Round-2 extension to the full reference population scale: 3 more teacher
# waves (K=128, fresh seeds -> fresh airframes) on top of the 640-teacher
# union = 1024 teachers (reference: 1000, README:206-207 `seq 0 999`),
# then the reference-scale distillation + eval-parity + exports for the
# 1024-teacher student. Waits for the night queue (fused-collect TPU
# validation) so the distillation can use the fused kernel if it gated ok.
set -u
cd /root/repo
while [ ! -f /tmp/night_done ]; do sleep 60; done
sleep 15

# fixed-methodology fused-collect benchmark at a dispatch-amortizing
# workload (union640: 2.56M env-steps/call): single-closed-loop-step parity
# gate + marginal timing with n_lo=2/n_hi=8
echo "=== bench_collect v2 (union640) $(date) ==="
timeout 2700 python -m raptor_tpu.apps.bench_collect \
  experiments/union640_checkpoints.txt \
  --envs-per-teacher 8 --out artifacts/bench_collect_r02.json \
  > /tmp/bench_collect3.log 2>&1
echo "bench_collect v2 rc=$?"
sleep 10

for SEED in 500 600 700; do
  echo "=== wave seed $SEED start $(date) ==="
  timeout 7200 python -m raptor_tpu.apps.pre_training \
    --population 128 --super-steps 3000 --steps-per-call 10 \
    --replay-capacity 1536 --seed "$SEED" \
    > "/tmp/pretrain_wave_seed${SEED}.log" 2>&1
  echo "=== wave seed $SEED done $(date) rc=$? ==="
  sleep 20
done

# union manifest: every completed K=128 wave
UNION=experiments/union1024_checkpoints.txt
: > "$UNION"
for M in experiments/*/*_pre_training/checkpoints.txt; do
  if [ "$(wc -l < "$M")" -eq 128 ]; then
    cat "$M" >> "$UNION"
    echo "wave manifest: $M" >&2
  fi
done
echo "union teachers: $(wc -l < "$UNION")"

FUSED=""
if python3 - << 'EOF'
import json, sys
try:
    r = json.load(open("artifacts/bench_collect_r02.json"))
    ok = r.get("parity_ok") and r.get("speedup", 0) >= 1.0
except Exception:
    ok = False
sys.exit(0 if ok else 1)
EOF
then
  FUSED="--fused-collect"
  echo "fused collect enabled"
fi

echo "=== 1024-teacher distillation start $(date) ==="
timeout 14400 python -m raptor_tpu.apps.post_training "$UNION" \
  --rounds 160 --envs-per-teacher 5 \
  --aggregate-capacity 40960 --grad-steps-per-round 913 \
  --teacher-mix-rounds 40 --eval-max-angle 1.0 --eval-every-rounds 5 \
  $FUSED --seed 0 \
  > /tmp/distill1024.log 2>&1
DISTILL_RC=$?
echo "=== 1024-teacher distillation done $(date) rc=$DISTILL_RC ==="
sleep 10

# take the student path from THIS run's own output (a newest-dir glob would
# silently pick the previous 640-teacher run if this one failed)
STUDENT=$(grep -o "experiments/[^ ]*final\.h5" /tmp/distill1024.log | tail -1)
if [ "$DISTILL_RC" -ne 0 ] || [ -z "$STUDENT" ] || [ ! -f "$STUDENT" ]; then
  echo "1024-teacher distillation FAILED (rc=$DISTILL_RC student='$STUDENT') — skipping artifact publication"
  touch /tmp/waves1024_done
  exit 1
fi
RUN=$(dirname "$(dirname "$STUDENT")")
echo "student: $STUDENT"
timeout 5400 python -m raptor_tpu.apps.eval_parity \
  --checkpoint "$STUDENT" --out artifacts/eval_parity_1024.json \
  > /tmp/eval_parity_1024.log 2>&1
echo "eval_parity rc=$?"
sleep 10

env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu bash -c "
  cp '$STUDENT' artifacts/student_1024teachers.h5 &&
  cp \$(ls '$RUN'/events.out.tfevents.* | head -1) artifacts/distill_1024teachers.tfevents &&
  python -m raptor_tpu.apps.export_policy artifacts/student_1024teachers.h5 artifacts/student_1024_policy.h --format raptor &&
  python -m raptor_tpu.apps.compare_baseline artifacts/distill_1024teachers.tfevents --out artifacts/compare_1024.md > artifacts/compare_1024.json" \
  > /tmp/post1024.log 2>&1
echo "exports rc=$?"
touch /tmp/waves1024_done
echo "=== waves1024 done $(date) ==="
