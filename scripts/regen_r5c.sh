#!/bin/bash
# Round-5 third tail — runs AFTER regen_r5b.sh drains.  Knockout + trace
# attribution of the FUSED step (where do the 19 ms go?), so the fused
# kernel's PERF.md section carries the same evidence standard as the XLA
# step it replaced.
set -x
cd /root/repo
step() {
  local name=$1; shift
  local t0=$SECONDS
  echo "=== [$name] start $(date -u +%H:%M:%S)" >> logs_bg/queue_r5c.log
  "$@" >> "logs_bg/${name}.log" 2>&1
  echo "=== [$name] rc=$? dt=$((SECONDS-t0))s" >> logs_bg/queue_r5c.log
}
for i in $(seq 1 720); do
  grep -q 'r5b queue done' logs_bg/queue_r5b.log 2>/dev/null && break
  sleep 30
done
step trace_step_fused_r5 timeout 3600 env FUSED_EMBED=auto \
  python scripts/trace_step.py --trace-dir logs_bg/trace_r5_fused
echo "=== r5c queue done $(date -u +%H:%M:%S)" >> logs_bg/queue_r5c.log
