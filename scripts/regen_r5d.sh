#!/bin/bash
# Round-5 fourth tail — after regen_r5c.sh: fused-kernel TILE autotune
# (full-step bench at TILE 2048/8192 vs the shipped 4096) and a final
# fused bench repeat for the record.
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
step bench_tile_2048_r5 timeout 3600 env FUSED_EMBED=auto PCNERF_FUSED_TILE=2048 python bench.py
step bench_tile_8192_r5 timeout 3600 env FUSED_EMBED=auto PCNERF_FUSED_TILE=8192 python bench.py
step bench_tile_4096_r5 timeout 1200 env FUSED_EMBED=auto python bench.py
echo "=== r5d queue done $(date -u +%H:%M:%S)" >> logs_bg/queue_r5d.log
