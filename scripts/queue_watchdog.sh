#!/bin/bash
# Stall watchdog for the regen queue: the tunneled TPU backend sporadically
# wedges an RPC stream mid-job (r3 saw it too — logs_bg/watchdog.log); the
# job's process then blocks forever in tcp recv while its log stops growing.
# This monitor kills ONLY such wedged jobs so the queue's `timeout` wrapper
# returns early and trainings retry via --resume on the next queue pass.
#
# Safety: victims are identified by EXACT pid — a python child of the given
# queue shell's process tree whose stdout (fd/1) points at a regular file
# that has not grown/been touched for STALL seconds.  No name patterns, no
# pkill.  Long compiles are silent for ~5-6 min; STALL must stay well above.
#
#   bash scripts/queue_watchdog.sh <queue_pid> [stall_seconds]
QUEUE=$1
STALL=${2:-900}
LOG=logs_bg/queue_watchdog.log
cd /root/repo
echo "=== watchdog for queue $QUEUE (stall ${STALL}s) $(date -u +%H:%M:%S)" >> $LOG

descendants() {  # all pids under $1
  local p=$1 kids
  kids=$(pgrep -P "$p" 2>/dev/null)
  for k in $kids; do
    echo "$k"
    descendants "$k"
  done
}

while kill -0 "$QUEUE" 2>/dev/null; do
  sleep 60
  now=$(date +%s)
  for pid in $(descendants "$QUEUE"); do
    comm=$(cat /proc/$pid/comm 2>/dev/null)
    [ "$comm" = "python" ] || continue
    out=$(readlink /proc/$pid/fd/1 2>/dev/null)
    case "$out" in
      /root/repo/logs_bg/*.log) ;;
      *) continue ;;
    esac
    mt=$(stat -c %Y "$out" 2>/dev/null) || continue
    # a re-run APPENDS to its old log: until the first write the mtime is
    # the PREVIOUS run's — measure idle from the later of log activity and
    # process start (this killed a healthy retrain 0 s in, once)
    ps=$(stat -c %Y /proc/$pid 2>/dev/null) || continue
    [ "$ps" -gt "$mt" ] && mt=$ps
    age=$((now - mt))
    if [ "$age" -gt "$STALL" ]; then
      echo "--- $(date -u +%H:%M:%S) pid $pid wedged (log $out idle ${age}s); killing" >> $LOG
      kill "$pid" 2>/dev/null
      sleep 5
      kill -9 "$pid" 2>/dev/null
    fi
  done
done
echo "=== queue $QUEUE gone; watchdog exiting $(date -u +%H:%M:%S)" >> $LOG
