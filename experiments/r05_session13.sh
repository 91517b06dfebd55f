#!/bin/bash
# Round-5 session-13 — seed-1 replicate of the CurMix FLAGSHIP (gate-pass + cf 427.5
# + agg 358.9 are single-seed; quantify the flagship claim variance).


set -u
cd /root/repo
END_TS=${1:?END_TS epoch}
while [ ! -f /tmp/r05_session12_done ]; do sleep 60; done
remaining() { echo $(( END_TS - $(date +%s) )); }
R=$(remaining)
if [ "$R" -le 1500 ]; then echo "SKIPPED (remaining ${R}s)"; touch /tmp/r05_session13_done; exit 0; fi
echo "=== rateFlagCurMixS1 start $(date) ==="
STAMP=/tmp/stamp_curmixs1; touch "$STAMP"
timeout 1800 python -m raptor_tpu.apps.post_training \
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
  if [ "$R" -gt 300 ]; then
    timeout $(( R > 1800 ? 1800 : R - 60 )) \
      python -m raptor_tpu.apps.eval_parity \
      --checkpoint artifacts/student_rateFlagCurMixS1.h5 \
      --out artifacts/eval_parity_rateFlagCurMixS1.json \
      > /tmp/eval_parity_rateFlagCurMixS1.log 2>&1
    echo "eval_parity rc=$? $(date)"
  fi
fi
touch /tmp/r05_session13_done
echo "=== session13 done, TPU idle $(date) ==="
