#!/bin/bash
# Watchdog for flagship2 pre-training waves: one lost tunnel RPC blocks the
# PJRT client forever (observed on wave seed=900: frozen at super-step
# ~5950/6000 for 40+ min while a fresh client computed fine). Training logs
# a tfevents row every ~1.1 s, so >20 min of file silence mid-training is an
# unambiguous hang. Kill the EXACT python PID found by walking the chain's
# process tree (chain bash -> timeout -> python); never kill by pattern.
#
# Usage: wave_watchdog.sh <chain_bash_pid>
set -u
CHAIN_PID=$1
LOG=/tmp/wave_watchdog.log
echo "watchdog start $(date) chain=$CHAIN_PID" >> "$LOG"
while true; do
  sleep 120
  [ -f /tmp/waves512_done ] && { echo "waves done, exiting $(date)" >> "$LOG"; exit 0; }
  kill -0 "$CHAIN_PID" 2>/dev/null || { echo "chain gone, exiting $(date)" >> "$LOG"; exit 0; }
  # chain bash -> timeout -> python (pre_training only)
  TO_PID=$(ps -o pid= --ppid "$CHAIN_PID" | head -1 | tr -d ' ')
  [ -n "$TO_PID" ] || continue
  PY_PID=$(ps -o pid= --ppid "$TO_PID" | head -1 | tr -d ' ')
  [ -n "$PY_PID" ] || continue
  grep -q "raptor_tpu.apps.pre_training" "/proc/$PY_PID/cmdline" 2>/dev/null || continue
  EV=$(ls -t experiments/*/*_pre_training/events.out.tfevents.* 2>/dev/null | head -1)
  [ -n "$EV" ] || continue
  SIZE=$(stat -c %s "$EV")
  # activity = newest write anywhere in the run dir: after the training
  # loop, tfevents goes silent while the final teacher export writes
  # h5/json files one by one — that is progress, not a hang.
  RUNDIR=$(dirname "$EV")
  LAST=$(find "$RUNDIR" -type f -printf '%T@\n' 2>/dev/null | sort -n | tail -1 | cut -d. -f1)
  [ -n "$LAST" ] || continue
  AGE=$(( $(date +%s) - LAST ))
  if [ "$SIZE" -gt 1024 ] && [ "$AGE" -gt 1200 ]; then
    echo "HANG: $RUNDIR silent ${AGE}s (events size $SIZE); killing $PY_PID $(date)" >> "$LOG"
    kill "$PY_PID"
    sleep 30
    kill -0 "$PY_PID" 2>/dev/null && kill -9 "$PY_PID"
  fi
done
