#!/bin/bash
# Round-4 BPTT-SAC diagnosis (VERDICT r3 weak #5 / next item 8).
# Round 3: 470.5/500 @ 7.4% (249M steps, symmetric critics on the policy
# obs slice). Two diagnosis runs on the eval-parity protocol:
#   B: privileged critics (full obs incl. dynamics tail), SAME budget —
#      isolates the asymmetric-critic effect vs eval_parity_gru_sac_r03
#   A: privileged critics + critic GRU width 32 + 4x budget (1.0B steps)
#      — the ceiling attempt (VERDICT: "4x budget + one sweep axis")
# Target: >= 482.8-equivalent (reference final) or a measured-ceiling
# paragraph in RESULTS.
set -u
cd /root/repo

while [ ! -f /tmp/r04_k1024_done ]; do sleep 60; done

run_gru () {  # tag super_steps critic_hidden
  local TAG=$1 SS=$2 CH=$3
  echo "=== gru_sac $TAG start $(date) ==="
  timeout 14400 python -m raptor_tpu.apps.train_gru_sac \
    --n-envs 1024 --super-steps "$SS" --rollout-length 64 \
    --steps-per-call 10 --gradient-steps 8 --batch-size 64 --seq-len 64 \
    --critic-hidden "$CH" \
    --eval-every 20 --eval-max-angle 1.0 --seed 0 \
    > "/tmp/gru_sac_${TAG}.log" 2>&1
  echo "=== gru_sac $TAG rc=$? $(date) ==="
  local GRU
  GRU=$(grep -o "experiments/[^ ]*\.h5" "/tmp/gru_sac_${TAG}.log" | tail -1)
  if [ -n "$GRU" ] && [ -f "$GRU" ]; then
    local RUN
    RUN=$(dirname "$(dirname "$GRU")")
    cp "$GRU" "artifacts/gru_sac_${TAG}.h5"
    cp $(ls "$RUN"/events.out.tfevents.* | head -1) \
      "artifacts/gru_sac_${TAG}.tfevents" || true
    timeout 5400 python -m raptor_tpu.apps.eval_parity \
      --checkpoint "artifacts/gru_sac_${TAG}.h5" \
      --out "artifacts/eval_parity_gru_sac_${TAG}.json" \
      > "/tmp/eval_parity_gru_${TAG}.log" 2>&1
    echo "=== eval_parity $TAG rc=$? $(date) ==="
  fi
  sleep 10
}

run_gru privB_1x 380 16
run_gru privA_4x 1520 32

touch /tmp/r04_gru_done
echo "=== r04 gru chain done $(date) ==="
