#!/bin/bash
# Regenerate the wave lost to the second tunnel hang (seed 900 froze at
# super-step 5911/6000 BEFORE the periodic-export fix landed, so nothing
# was saved), then run the full 512-teacher reference-scale distillation
# from the four committed teacher packs — exercising the multi-pack
# manifest path in load_teachers, the reimage-surviving route.
# Waits for the flagship2 chain AND its bench refresh to release the TPU
# (one-TPU-process rule, NOTES.md).
set -u
cd /root/repo

while [ ! -f /tmp/postflagship_done ]; do sleep 120; done
sleep 30

bash experiments/watchdog2.sh $$ /tmp/wave900_done < /dev/null >> /tmp/wave_watchdog.log 2>&1 &

echo "=== retry wave seed 900 start $(date) ==="
touch /tmp/wave900_start_marker
timeout 12600 python -m raptor_tpu.apps.pre_training \
  --population 128 --super-steps 6000 --steps-per-call 10 \
  --replay-capacity 1536 --seed 900 \
  > /tmp/pretrain_w900b.log 2>&1
echo "=== retry wave seed 900 done rc=$? $(date) ==="
touch /tmp/wave900_done
# only a manifest created by THIS wave (newer than the start marker) may be
# packed as seed 900 — a failed wave must not re-pack an older wave's
# teachers under a new name (duplicates in the union).
M=$(find experiments -name checkpoints.txt -path "*_pre_training/*" \
     -newer /tmp/wave900_start_marker | head -1)
if [ -n "$M" ]; then
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu \
    timeout 1800 python -m raptor_tpu.apps.pack_teachers pack "$M" \
    artifacts/teachers_seed900_30M.npz \
    >> /tmp/pack_waves.log 2>&1
  echo "pack rc=$?"
else
  echo "wave 900 retry produced NO manifest; distilling from the packs that exist"
fi
sleep 5

UNION=experiments/union512_packs.txt
: > "$UNION"
for S in 900 1000 1100 1200; do
  P="artifacts/teachers_seed${S}_30M.npz"
  [ -f "$P" ] && echo "$P" >> "$UNION"
done
echo "union packs: $(cat "$UNION" | wc -l) x 128 teachers"

echo "=== 512x30M distillation start $(date) ==="
timeout 14400 python -m raptor_tpu.apps.post_training "$UNION" \
  --rounds 160 --envs-per-teacher 10 \
  --aggregate-capacity 40960 --grad-steps-per-round 913 \
  --teacher-mix-rounds 40 --eval-max-angle 1.0 --eval-every-rounds 5 \
  --seed 0 \
  > /tmp/distill512full.log 2>&1
DISTILL_RC=$?
echo "=== distillation done rc=$DISTILL_RC $(date) ==="
sleep 10

STUDENT=$(grep -o "experiments/[^ ]*final\.h5" /tmp/distill512full.log | tail -1)
if [ "$DISTILL_RC" -ne 0 ] || [ -z "$STUDENT" ] || [ ! -f "$STUDENT" ]; then
  echo "distillation FAILED (rc=$DISTILL_RC student='$STUDENT')"
  touch /tmp/wave900_retry_done
  exit 1
fi
RUN=$(dirname "$(dirname "$STUDENT")")
echo "student: $STUDENT"
timeout 5400 python -m raptor_tpu.apps.eval_parity \
  --checkpoint "$STUDENT" --out artifacts/eval_parity_512x30M.json \
  > /tmp/eval_parity_512full.log 2>&1
echo "eval_parity rc=$?"
sleep 10

env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu RAPTOR_PLATFORM=cpu bash -c "
  cp '$STUDENT' artifacts/student_512x30M.h5 &&
  cp \$(ls '$RUN'/events.out.tfevents.* | head -1) artifacts/distill_512x30M.tfevents &&
  python -m raptor_tpu.apps.compare_baseline artifacts/distill_512x30M.tfevents --out artifacts/compare_512x30M.md > artifacts/compare_512x30M.json" \
  > /tmp/wave900_exports.log 2>&1
echo "exports rc=$?"
touch /tmp/wave900_retry_done
echo "=== wave900 retry chain done $(date) ==="
