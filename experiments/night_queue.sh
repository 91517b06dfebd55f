#!/bin/bash
# Round-2 night TPU queue (after evening_queue): validate the FIXED fused
# DAgger-collect kernel on the real TPU (the 16:00 bench_collect run failed
# to compile: Mosaic has no uint32->float32 cast; fixed in commit 6f6eee5),
# then demonstrate an end-to-end fused-collect distillation, then refresh
# bench.py numbers.
set -u
cd /root/repo
while [ ! -f /tmp/evening_done ]; do sleep 30; done
sleep 15
mkdir -p artifacts

WAVE1=experiments/2026-08-17_11-29-03/2026-08-17_11-29-03_pre_training/checkpoints.txt

echo "=== bench_collect (fixed kernel) $(date) ==="
timeout 2700 python -m raptor_tpu.apps.bench_collect "$WAVE1" \
  --envs-per-teacher 8 --out artifacts/bench_collect_r02.json \
  > /tmp/bench_collect2.log 2>&1
RC=$?
echo "bench_collect rc=$RC"
sleep 10

if [ "$RC" -eq 0 ]; then
  echo "=== fused-collect distill demo (20 rounds) $(date) ==="
  timeout 3600 python -m raptor_tpu.apps.post_training "$WAVE1" \
    --rounds 20 --envs-per-teacher 8 \
    --aggregate-capacity 10240 --grad-steps-per-round 200 \
    --teacher-mix-rounds 0 --eval-max-angle 1.0 --eval-every-rounds 10 \
    --fused-collect --seed 3 \
    > /tmp/fused_distill_demo.log 2>&1
  echo "fused demo rc=$?"
  sleep 10
fi

echo "=== bench.py refresh $(date) ==="
timeout 3600 python bench.py > /tmp/bench_night.log 2>&1
echo "bench rc=$?"
tail -1 /tmp/bench_night.log

touch /tmp/night_done
echo "=== night queue done $(date) ==="
