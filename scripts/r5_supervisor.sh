#!/bin/bash
# Relentless chip-session supervisor (VERDICT r4 #1): keeps exactly one
# r4_chip_session.py alive for the whole round. The session itself retries
# backend claims in-process (wait_for_backend); this loop only restarts it if
# the PROCESS dies (crash/OOM) before the session completed, and never kills
# anything by pattern — only the exact PID it started is tracked.
#
# Usage: nohup scripts/r5_supervisor.sh [phases...] >> exp/r5_supervisor.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
PHASES=("${@:-}")
[ -z "${PHASES[0]:-}" ] && PHASES=(bench dispatch mesh planet pets_hc)
PIDFILE=exp/r5_chip_session.pid
LOG=exp/r5_chip_session.log

while true; do
  PID=$(cat "$PIDFILE" 2>/dev/null || true)
  # alive AND actually our session (a recycled pid from a stale pidfile must
  # not make the supervisor sleep forever next to a dead session)
  if [ -n "$PID" ] && kill -0 "$PID" 2>/dev/null \
     && tr '\0' ' ' < "/proc/$PID/cmdline" 2>/dev/null | grep -q r4_chip_session; then
    sleep 300
    continue
  fi
  # completed only if the end marker appears AFTER the latest session header
  # (the log is append-mode and may hold markers from previous sessions)
  if awk '/r4 chip session: phases/ {done=0} /chip session end/ {done=1} END {exit !done}' \
      "$LOG" 2>/dev/null; then
    echo "supervisor: session completed; exiting ($(date -u +%H:%M:%S))"
    break
  fi
  echo "supervisor: (re)starting chip session ($(date -u +%H:%M:%S))"
  MBRL_TPU_WAIT_MINUTES=${MBRL_TPU_WAIT_MINUTES:-400} \
  R4_SESSION_MINUTES=${R4_SESSION_MINUTES:-270} \
  R4_PETS_MINUTES=${R4_PETS_MINUTES:-60} \
    nohup python scripts/r4_chip_session.py "${PHASES[@]}" >> "$LOG" 2>&1 &
  echo $! > "$PIDFILE"
  sleep 300
done
