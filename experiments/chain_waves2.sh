#!/bin/bash
# Round-2 teacher wave chain (restart): trains waves 2-4 (K=128 each,
# seeds 200/300/400 -> fresh airframes) sequentially on the TPU (one
# process at a time, NOTES.md). Union with seed-13 (round 1) and seed-100
# (wave 1) gives a 640-teacher population for the big distillation
# (reference: 1000 teachers, README:206-207).
set -u
cd /root/repo
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
