#!/bin/bash
# Parameterized wave watchdog (generalizes wave_watchdog.sh, which is kept
# untouched because an instance of it is running — editing a live bash
# script corrupts its execution). Kills the exact pre_training python PID
# in the given chain's lineage after >20 min of run-dir silence (tunnel
# hang, NOTES.md). Usage: watchdog2.sh <chain_bash_pid> <done_file>
set -u
CHAIN_PID=$1
DONE_FILE=$2
LOG=/tmp/wave_watchdog.log
echo "watchdog2 start $(date) chain=$CHAIN_PID done=$DONE_FILE" >> "$LOG"
while true; do
  sleep 120
  [ -f "$DONE_FILE" ] && { echo "watchdog2: done-file, exiting $(date)" >> "$LOG"; exit 0; }
  kill -0 "$CHAIN_PID" 2>/dev/null || { echo "watchdog2: chain gone, exiting $(date)" >> "$LOG"; exit 0; }
  # chain bash -> timeout -> python (pre_training only)
  TO_PID=$(ps -o pid= --ppid "$CHAIN_PID" | head -1 | tr -d ' ')
  [ -n "$TO_PID" ] || continue
  PY_PID=$(ps -o pid= --ppid "$TO_PID" | head -1 | tr -d ' ')
  [ -n "$PY_PID" ] || continue
  grep -q "raptor_tpu.apps.pre_training" "/proc/$PY_PID/cmdline" 2>/dev/null || continue
  EV=$(ls -t experiments/*/*_pre_training/events.out.tfevents.* 2>/dev/null | head -1)
  [ -n "$EV" ] || continue
  SIZE=$(stat -c %s "$EV")
  RUNDIR=$(dirname "$EV")
  LAST=$(find "$RUNDIR" -type f -printf '%T@\n' 2>/dev/null | sort -n | tail -1 | cut -d. -f1)
  [ -n "$LAST" ] || continue
  AGE=$(( $(date +%s) - LAST ))
  if [ "$SIZE" -gt 1024 ] && [ "$AGE" -gt 1200 ]; then
    echo "watchdog2 HANG: $RUNDIR silent ${AGE}s; killing $PY_PID $(date)" >> "$LOG"
    kill "$PY_PID"
    sleep 30
    kill -0 "$PY_PID" 2>/dev/null && kill -9 "$PY_PID"
  fi
done
