#!/bin/bash
# Round-5 session-11 — curated x pure-0.65 x 2x budget (CurPure is the double
# champion: 361.7 pi-agg + 436.3 cf at 1x; CurLong showed 2x helps curated).


set -u
cd /root/repo
END_TS=${1:?END_TS epoch}
while [ ! -f /tmp/r05_session10_done ]; do sleep 60; done
remaining() { echo $(( END_TS - $(date +%s) )); }
R=$(remaining)
if [ "$R" -le 2700 ]; then echo "SKIPPED (remaining ${R}s)"; touch /tmp/r05_session11_done; exit 0; fi
echo "=== rateFlagCurPureLong start $(date) ==="
STAMP=/tmp/stamp_curpurelong; touch "$STAMP"
timeout 3000 python -m raptor_tpu.apps.post_training \
  experiments/union_cur691_packs.txt \
  --rounds 320 --envs-per-teacher 8 --teachers-per-round 118 \
  --aggregate-capacity 40960 --grad-steps-per-round 913 \
  --teacher-mix-rounds 3 --eval-max-angle 1.0 --eval-every-rounds 40 \
  --collect-angle-power 4 --seed 0 \
  --demo-tilt 1.2 --demo-rate 5.0 --demo-adaptive \
  --demo-w-cap 999 --demo-k-w 999 \
  --demo-c-flip 0.65 --demo-c-lag 0.8 --demo-c-bw 2.0 \
  > /tmp/distill_rateFlagCurPureLong.log 2>&1
echo "distill rc=$? $(date)"
STUDENT=$(grep -o "experiments/[^ ]*final\.h5" /tmp/distill_rateFlagCurPureLong.log | tail -1)
if [ -z "$STUDENT" ] || [ ! -f "$STUDENT" ]; then
  STUDENT=$(find experiments -name '*.h5' -newer "$STAMP" \
            -path '*post_training*' 2>/dev/null | xargs -r ls -t | head -1)
fi
if [ -n "$STUDENT" ] && [ -f "$STUDENT" ]; then
  cp "$STUDENT" artifacts/student_rateFlagCurPureLong.h5
  R=$(remaining)
  if [ "$R" -gt 300 ]; then
    timeout $(( R > 1800 ? 1800 : R - 60 )) \
      python -m raptor_tpu.apps.eval_parity \
      --checkpoint artifacts/student_rateFlagCurPureLong.h5 \
      --out artifacts/eval_parity_rateFlagCurPureLong.json \
      > /tmp/eval_parity_rateFlagCurPureLong.log 2>&1
    echo "eval_parity rc=$? $(date)"
  fi
fi
touch /tmp/r05_session11_done
echo "=== session11 done, TPU idle $(date) ==="
