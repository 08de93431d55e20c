#!/bin/bash
# Round-5 fourth tail — after regen_r5c.sh: retry the big-batch curve
# points that hit the remote-compile hang (2048/4096, shorter timeouts),
# then the fused-kernel TILE autotune.
set -x
cd /root/repo
step() {
  local name=$1; shift
  local t0=$SECONDS
  echo "=== [$name] start $(date -u +%H:%M:%S)" >> logs_bg/queue_r5d.log
  "$@" >> "logs_bg/${name}.log" 2>&1
  echo "=== [$name] rc=$? dt=$((SECONDS-t0))s" >> logs_bg/queue_r5d.log
}
for i in $(seq 1 720); do
  grep -q 'r5c queue done' logs_bg/queue_r5c.log 2>/dev/null && break
  sleep 30
done
grep -q '"batch": 2048' logs_bg/bench_curve_r5.log 2>/dev/null || \
step bench_curve_r5 timeout 1500 env FUSED_EMBED=auto BENCH_BATCH=2048 python bench.py
grep -q '"batch": 4096' logs_bg/bench_curve_r5.log 2>/dev/null || \
step bench_curve_r5 timeout 1500 env FUSED_EMBED=auto BENCH_BATCH=4096 python bench.py
step bench_tile_2048_r5 timeout 1500 env FUSED_EMBED=auto PCNERF_FUSED_TILE=2048 python bench.py
step bench_tile_8192_r5 timeout 1500 env FUSED_EMBED=auto PCNERF_FUSED_TILE=8192 python bench.py
echo "=== r5d queue done $(date -u +%H:%M:%S)" >> logs_bg/queue_r5d.log
