#!/bin/bash
# Round-2 teacher wave chain: waits for the running wave-1 pre-training
# (PID $1), then trains waves 2-4 (K=128 each, fresh seeds -> fresh
# airframes) sequentially on the TPU (one process at a time, NOTES.md).
# Union with round-1's K=128 gives a 640-teacher population for the big
# distillation (reference: 1000 teachers, README:206-207).
set -u
cd /root/repo
WAVE1_PID=${1:?usage: chain_waves.sh <wave1_pid>}
tail --pid="$WAVE1_PID" -f /dev/null 2>/dev/null
sleep 20
for SEED in 200 300 400; do
  echo "=== wave seed $SEED start $(date) ==="
  python -m raptor_tpu.apps.pre_training \
    --population 128 --super-steps 3000 --steps-per-call 10 \
    --replay-capacity 1536 --seed "$SEED" \
    > "/tmp/pretrain_wave_seed${SEED}.log" 2>&1
  echo "=== wave seed $SEED done $(date) rc=$? ==="
  sleep 20
done
touch /tmp/waves_done
echo "ALL WAVES DONE $(date)"
