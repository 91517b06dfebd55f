#!/bin/bash
# Round-5 session-12 — seed-1 replicate of the CurPure double champion
# (361.7 agg + 436.3 cf are single-seed numbers; quantify variance).


set -u
cd /root/repo
END_TS=${1:?END_TS epoch}
while [ ! -f /tmp/r05_session11_done ]; do sleep 60; done
remaining() { echo $(( END_TS - $(date +%s) )); }
R=$(remaining)
if [ "$R" -le 1500 ]; then echo "SKIPPED (remaining ${R}s)"; touch /tmp/r05_session12_done; exit 0; fi
echo "=== rateFlagCurPureS1 start $(date) ==="
STAMP=/tmp/stamp_curpures1; touch "$STAMP"
timeout 1800 python -m raptor_tpu.apps.post_training \
  experiments/union_cur691_packs.txt \
  --rounds 160 --envs-per-teacher 8 --teachers-per-round 118 \
  --aggregate-capacity 40960 --grad-steps-per-round 913 \
  --teacher-mix-rounds 3 --eval-max-angle 1.0 --eval-every-rounds 20 \
  --collect-angle-power 4 --seed 1 \
  --demo-tilt 1.2 --demo-rate 5.0 --demo-adaptive \
  --demo-w-cap 999 --demo-k-w 999 \
  --demo-c-flip 0.65 --demo-c-lag 0.8 --demo-c-bw 2.0 \
  > /tmp/distill_rateFlagCurPureS1.log 2>&1
echo "distill rc=$? $(date)"
STUDENT=$(grep -o "experiments/[^ ]*final\.h5" /tmp/distill_rateFlagCurPureS1.log | tail -1)
if [ -z "$STUDENT" ] || [ ! -f "$STUDENT" ]; then
  STUDENT=$(find experiments -name '*.h5' -newer "$STAMP" \
            -path '*post_training*' 2>/dev/null | xargs -r ls -t | head -1)
fi
if [ -n "$STUDENT" ] && [ -f "$STUDENT" ]; then
  cp "$STUDENT" artifacts/student_rateFlagCurPureS1.h5
  R=$(remaining)
  if [ "$R" -gt 300 ]; then
    timeout $(( R > 1800 ? 1800 : R - 60 )) \
      python -m raptor_tpu.apps.eval_parity \
      --checkpoint artifacts/student_rateFlagCurPureS1.h5 \
      --out artifacts/eval_parity_rateFlagCurPureS1.json \
      > /tmp/eval_parity_rateFlagCurPureS1.log 2>&1
    echo "eval_parity rc=$? $(date)"
  fi
fi
touch /tmp/r05_session12_done
echo "=== session12 done, TPU idle $(date) ==="
