#!/bin/bash
# Round-5 session-10 — curated x Mix x 2x budget (CurLong showed 2x budget
# helps ON THE CURATED union: 360.0 pi-agg vs 358.5 at 1x).


set -u
cd /root/repo
END_TS=${1:?END_TS epoch}
while [ ! -f /tmp/r05_session9_done ]; do sleep 60; done
remaining() { echo $(( END_TS - $(date +%s) )); }
R=$(remaining)
if [ "$R" -le 2700 ]; then echo "SKIPPED (remaining ${R}s)"; touch /tmp/r05_session10_done; exit 0; fi
echo "=== rateFlagCurMixLong start $(date) ==="
STAMP=/tmp/stamp_curmixlong; touch "$STAMP"
timeout 3000 python -m raptor_tpu.apps.post_training \
  experiments/union_cur691_packs.txt \
  --rounds 320 --envs-per-teacher 8 --teachers-per-round 118 \
  --aggregate-capacity 40960 --grad-steps-per-round 913 \
  --teacher-mix-rounds 3 --eval-max-angle 1.0 --eval-every-rounds 40 \
  --collect-angle-power 4 --seed 0 \
  --demo-tilt 1.2 --demo-rate 5.0 --demo-adaptive \
  --demo-w-cap 999 --demo-k-w 999 \
  --demo-c-flip 0.5 --demo-c-lag 1.2 --demo-c-bw 3.0 \
  > /tmp/distill_rateFlagCurMixLong.log 2>&1
echo "distill rc=$? $(date)"
STUDENT=$(grep -o "experiments/[^ ]*final\.h5" /tmp/distill_rateFlagCurMixLong.log | tail -1)
if [ -z "$STUDENT" ] || [ ! -f "$STUDENT" ]; then
  STUDENT=$(find experiments -name '*.h5' -newer "$STAMP" \
            -path '*post_training*' 2>/dev/null | xargs -r ls -t | head -1)
fi
if [ -n "$STUDENT" ] && [ -f "$STUDENT" ]; then
  cp "$STUDENT" artifacts/student_rateFlagCurMixLong.h5
  R=$(remaining)
  if [ "$R" -gt 300 ]; then
    timeout $(( R > 1800 ? 1800 : R - 60 )) \
      python -m raptor_tpu.apps.eval_parity \
      --checkpoint artifacts/student_rateFlagCurMixLong.h5 \
      --out artifacts/eval_parity_rateFlagCurMixLong.json \
      > /tmp/eval_parity_rateFlagCurMixLong.log 2>&1
    echo "eval_parity rc=$? $(date)"
  fi
fi
touch /tmp/r05_session10_done
echo "=== session10 done, TPU idle $(date) ==="
