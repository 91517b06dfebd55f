#!/bin/bash
# Session-5 supervisor: stage E (BPTT-SAC 4x, ~55 min) is lower priority
# than the student-capacity ablation queued in r04_endgap2.sh. When the
# main chain reaches stage E (or gru_privA actually launches), kill the
# chain by EXACT PIDs (never patterns) and raise the done-file so the
# end-gap starts immediately.
set -u
CHAIN_PID=${1:?chain pid}
LOG=/tmp/r04_session5.log

while true; do
  sleep 20
  if ! kill -0 "$CHAIN_PID" 2>/dev/null; then
    echo "supervisor: chain exited on its own $(date)"
    exit 0
  fi
  if grep -q "stage gru_privA" "$LOG" 2>/dev/null; then
    echo "supervisor: stage E reached — cutting chain $(date)"
    # kill exact descendants (timeout -> python), deepest first
    DESC=$(ps -o pid= --ppid "$CHAIN_PID" | tr -d ' ')
    for P in $DESC; do
      GRAND=$(ps -o pid= --ppid "$P" | tr -d ' ')
      for G in $GRAND; do kill "$G" 2>/dev/null; done
      kill "$P" 2>/dev/null
    done
    kill "$CHAIN_PID" 2>/dev/null
    sleep 10
    for P in $DESC $CHAIN_PID; do kill -9 "$P" 2>/dev/null; done
    touch /tmp/r04_session5_done
    exit 0
  fi
done
