#!/bin/bash
# Supervisor: when chain v2 (r04_session5b.sh) reaches its pytest stage,
# its remaining stages are superseded by chain v3 (recovery-reward wave +
# the same host-side round close). Cut v2 by exact PIDs, then exec v3.
set -u
V2_PID=${1:?chain v2 pid}
END_TS=${2:?end ts}
LOG=/tmp/r04_session5b.log

while true; do
  sleep 15
  if grep -q "stage cap32" "$LOG" 2>/dev/null; then break; fi
  if ! kill -0 "$V2_PID" 2>/dev/null; then
    echo "handoff: v2 exited before cap32 stage $(date)"
    break
  fi
done

if kill -0 "$V2_PID" 2>/dev/null; then
  echo "handoff: cutting v2 at cap32 boundary $(date)"
  DESC=$(ps -o pid= --ppid "$V2_PID" | tr -d ' ')
  for P in $DESC; do
    GRAND=$(ps -o pid= --ppid "$P" | tr -d ' ')
    for G in $GRAND; do kill "$G" 2>/dev/null; done
    kill "$P" 2>/dev/null
  done
  kill "$V2_PID" 2>/dev/null
  sleep 5
  for P in $DESC $V2_PID; do kill -9 "$P" 2>/dev/null; done
fi

exec bash experiments/r04_session5c.sh "$END_TS"
