#!/bin/bash
# Round-5 session-14 (final wrap-up session) — the missing seed-1 replicate of
# the FLAGSHIP rateFlagCurMix (its gate-pass + cf 427.5 + agg 358.9 are
# single-seed; session-13's slot went to the CurPure replicate instead).
# Hard END_TS cutoffs guarantee the TPU is idle before the driver's
# round-end bench window.

set -u
cd /root/repo
END_TS=${1:?END_TS epoch}
remaining() { echo $(( END_TS - $(date +%s) )); }
echo "=== rateFlagCurMixS1 start $(date) remaining $(remaining)s ==="
STAMP=/tmp/stamp_curmixs1; touch "$STAMP"
R=$(remaining)
[ "$R" -le 600 ] && { echo "SKIPPED (remaining ${R}s)"; exit 0; }
timeout $(( R - 420 > 1560 ? 1560 : R - 420 )) \
  python -m raptor_tpu.apps.post_training \
  experiments/union_cur691_packs.txt \
  --rounds 160 --envs-per-teacher 8 --teachers-per-round 118 \
  --aggregate-capacity 40960 --grad-steps-per-round 913 \
  --teacher-mix-rounds 3 --eval-max-angle 1.0 --eval-every-rounds 20 \
  --collect-angle-power 4 --seed 1 \
  --demo-tilt 1.2 --demo-rate 5.0 --demo-adaptive \
  --demo-w-cap 999 --demo-k-w 999 \
  --demo-c-flip 0.5 --demo-c-lag 1.2 --demo-c-bw 3.0 \
  > /tmp/distill_rateFlagCurMixS1.log 2>&1
echo "distill rc=$? $(date)"
STUDENT=$(grep -o "experiments/[^ ]*final\.h5" /tmp/distill_rateFlagCurMixS1.log | tail -1)
if [ -z "$STUDENT" ] || [ ! -f "$STUDENT" ]; then
  STUDENT=$(find experiments -name '*.h5' -newer "$STAMP" \
            -path '*post_training*' 2>/dev/null | xargs -r ls -t | head -1)
fi
if [ -n "$STUDENT" ] && [ -f "$STUDENT" ]; then
  cp "$STUDENT" artifacts/student_rateFlagCurMixS1.h5
  R=$(remaining)
  if [ "$R" -gt 180 ]; then
    timeout $(( R - 90 )) \
      python -m raptor_tpu.apps.eval_parity \
      --checkpoint artifacts/student_rateFlagCurMixS1.h5 \
      --out artifacts/eval_parity_rateFlagCurMixS1.json \
      > /tmp/eval_parity_rateFlagCurMixS1.log 2>&1
    echo "eval_parity rc=$? $(date)"
  fi
fi
echo "=== session14 done, TPU idle $(date) ==="
