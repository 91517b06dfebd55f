#!/bin/bash
# Generalized wave watchdog (v2): kills a hung pre_training python by
# EXACT PID (never by pattern) after >20 min of run-dir file silence
# mid-training — the lost-RPC tunnel hang (NOTES.md). Round-4 addition:
# the hang recurred on the severity wave at super-step ~5655/6000 and
# cost 25 min of manual detection; run this beside every unattended
# wave chain.
#
# Usage: wave_watchdog2.sh <chain_bash_pid> <done_file>
set -u
CHAIN_PID=$1
DONE_FILE=$2
LOG=/tmp/wave_watchdog.log
echo "watchdog2 start $(date) chain=$CHAIN_PID done=$DONE_FILE" >> "$LOG"
while true; do
  sleep 120
  [ -f "$DONE_FILE" ] && { echo "done-file present, exiting $(date)" >> "$LOG"; exit 0; }
  kill -0 "$CHAIN_PID" 2>/dev/null || { echo "chain gone, exiting $(date)" >> "$LOG"; exit 0; }
  # chain bash -> timeout -> python (pre_training only)
  TO_PID=$(ps -o pid= --ppid "$CHAIN_PID" | head -1 | tr -d ' ')
  [ -n "$TO_PID" ] || continue
  PY_PID=$(ps -o pid= --ppid "$TO_PID" | head -1 | tr -d ' ')
  [ -n "$PY_PID" ] || continue
  grep -q "raptor_tpu.apps.pre_training" "/proc/$PY_PID/cmdline" 2>/dev/null || continue
  # v3 fix (cost wave 1500, session 5): the newest run dir belongs to the
  # PREVIOUS wave until this python creates its own — a freshly started
  # wave must never be killed for the previous run's staleness. Only
  # consider run dirs created AFTER this python started; none yet =>
  # still compiling, leave it alone (`timeout` bounds a compile hang).
  PY_AGE=$(ps -o etimes= -p "$PY_PID" 2>/dev/null | tr -d ' ')
  [ -n "$PY_AGE" ] || continue
  PY_START=$(( $(date +%s) - PY_AGE ))
  EV=$(find experiments -name "events.out.tfevents.*" -path "*_pre_training*" \
       -newermt "@$PY_START" 2>/dev/null | head -1)
  [ -n "$EV" ] || continue
  SIZE=$(stat -c %s "$EV")
  RUNDIR=$(dirname "$EV")
  LAST=$(find "$RUNDIR" -type f -printf '%T@\n' 2>/dev/null | sort -n | tail -1 | cut -d. -f1)
  [ -n "$LAST" ] || continue
  AGE=$(( $(date +%s) - LAST ))
  if [ "$SIZE" -gt 1024 ] && [ "$AGE" -gt 1200 ]; then
    echo "HANG: $RUNDIR silent ${AGE}s; killing $PY_PID $(date)" >> "$LOG"
    kill "$PY_PID"
    sleep 30
    kill -0 "$PY_PID" 2>/dev/null && kill -9 "$PY_PID"
  fi
done
