#!/bin/bash
# Round-2 flagship run (VERDICT r1 items 1+2): distill the 640-teacher union
# (5 waves x K=128) into the GRU foundation policy at reference scale —
# 160 rounds x 913 grad steps = 146,080 gradient steps (reference: 146,103),
# 160 x 500 x 5120 envs = 410M env-steps (reference: 75.3M), DAgger
# aggregation reservoir, warmup-cosine LR, eval-parity protocol
# (max_angle=1.0) for the evaluation/* and crazyflie/* tags.
#
# Waits for the teacher wave chain to finish, validates the fused collect
# kernel on the TPU (bench_collect, VERDICT item 4 acceptance number), then
# launches the big distillation with --fused-collect iff the bench passed.
set -u
cd /root/repo
while [ ! -f /tmp/waves_done ]; do sleep 30; done
sleep 20

# union manifest: every completed K=128 pre-training wave
UNION=experiments/union640_checkpoints.txt
: > "$UNION"
for M in experiments/*/*_pre_training/checkpoints.txt; do
  if [ "$(wc -l < "$M")" -eq 128 ]; then
    cat "$M" >> "$UNION"
    echo "wave manifest: $M" >&2
  fi
done
echo "union teachers: $(wc -l < "$UNION")"

# fused-collect TPU validation + VERDICT item-4 benchmark (K=128 x 8)
WAVE1=experiments/2026-08-17_11-29-03/2026-08-17_11-29-03_pre_training/checkpoints.txt
mkdir -p artifacts
timeout 1800 python -m raptor_tpu.apps.bench_collect "$WAVE1" \
  --envs-per-teacher 8 --out artifacts/bench_collect_r02.json \
  > /tmp/bench_collect.log 2>&1
BENCH_RC=$?
# gate: rc==0 (includes the compiled-kernel parity spot-check, which exits 2
# on mismatch) AND measured speedup >= 1 over the XLA collect
FUSED=""
if [ "$BENCH_RC" -eq 0 ] && python3 - << 'EOF'
import json, sys
r = json.load(open("artifacts/bench_collect_r02.json"))
ok = r.get("parity_ok") and r.get("speedup", 0) >= 1.0
print(f"parity_err={r.get('parity_max_err')} speedup={r.get('speedup'):.1f}")
sys.exit(0 if ok else 1)
EOF
then
  FUSED="--fused-collect"
  echo "bench_collect parity+speedup ok -> fused collect enabled"
else
  echo "bench_collect rc=$BENCH_RC or gate failed -> XLA collect fallback"
fi
sleep 10

echo "=== big distillation start $(date) ==="
python -m raptor_tpu.apps.post_training "$UNION" \
  --rounds 160 --envs-per-teacher 8 \
  --aggregate-capacity 40960 --grad-steps-per-round 913 \
  --teacher-mix-rounds 40 --eval-max-angle 1.0 --eval-every-rounds 5 \
  $FUSED --seed 0 \
  > /tmp/big_distill.log 2>&1
echo "=== big distillation done $(date) rc=$? ==="
touch /tmp/big_distill_done
