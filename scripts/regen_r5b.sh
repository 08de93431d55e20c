#!/bin/bash
# Round-5 tail queue — runs AFTER regen_r5.sh drains (polls for its DONE
# marker).  Value-ordered for a tight wall clock:
#   1. bench A/B at batch 1024 (cached compiles, minutes): FUSED_EMBED=off
#      vs auto — the PERF.md headline comparison on a quiet chip.
#   2. fused end-to-end science check: train the KITTI 20% PC-NeRF cell
#      with --fused-embed auto and eval two-step — CD must reproduce the
#      0.2062-class row for the kernel to be default-eligible.
#   3. MaiCity s90 epoch-matched probe (labeled row).
#   4. eval-frame A/B: profile_eval off vs auto (occupancy passes are 40%
#      of the eval batch and transcendental-bound).
#   5. off-path batch-256 bench reference point.
# The closing pytest -rs runs separately (CPU-only, driven directly).
# Guard rail (the 13:24 lcf3e6 incident): every train is rate-checked —
# if its log shows <8k rays/s after warmup, kill+relaunch once (fresh
# process; the identical config measured 25k in a parallel probe while
# the cursed instance did 1.5k).
set -x
cd /root/repo
P=python
step() {
  local name=$1; shift
  local t0=$SECONDS
  echo "=== [$name] start $(date -u +%H:%M:%S)" >> logs_bg/queue_r5b.log
  "$@" >> "logs_bg/${name}.log" 2>&1
  local rc=$?
  echo "=== [$name] rc=$rc dt=$((SECONDS-t0))s" >> logs_bg/queue_r5b.log
  return $rc
}
trained() { [ -e "$1/DONE" ]; }
evaled() { grep -q '"cd"' "logs_bg/$1.log" 2>/dev/null; }

for i in $(seq 1 600); do
  grep -q 'r5 queue done' logs_bg/queue_r5.log 2>/dev/null && break
  sleep 30
done

KV=logs/kitti00/1151_1200_view
MAI=logs/maicity00/maicity_00_1

# --- 1. bench A/B (quiet chip) ------------------------------------------
step bench_ab_off_r5   timeout 3600 env FUSED_EMBED=off  $P bench.py
step bench_ab_fused_r5 timeout 3600 env FUSED_EMBED=auto $P bench.py
step bench_ab_fused_r5 timeout 1200 env FUSED_EMBED=auto $P bench.py

# --- 2. fused end-to-end science check ----------------------------------
FU=$KV/pcnerf_fused
trained $FU || \
step train_kitti_fused_r5 timeout 5400 $P -m pcnerf_tpu.train.run \
  --preset kitti00_pcnerf --dtype bfloat16 --skip-sanity-val \
  --fused-embed auto --out $FU --resume
evaled eval_kitti_fused_r5 || \
step eval_kitti_fused_r5 timeout 7200 $P scripts/eval_scene.py \
  --preset kitti00 --method 2 --version version_1 --fused-embed auto \
  --ckpt $FU/checkpoints/best --result-dir $FU/render_result

# --- 3. MaiCity s90 epoch-matched probe ---------------------------------
MS90E1=$MAI/pcnerf_s90_e1
trained $MS90E1 || \
step train_mai_s90_e1_r5 timeout 3600 $P -m pcnerf_tpu.train.run \
  --preset maicity00_pcnerf --sparsity 90 --dtype bfloat16 \
  --skip-sanity-val --out $MS90E1 --resume
evaled eval_mai_s90_e1_r5 || \
step eval_mai_s90_e1_r5 timeout 14400 $P scripts/eval_scene.py \
  --preset maicity00 --method 2 --version version_1 --sparsity 90 \
  --ckpt $MS90E1/checkpoints/best --result-dir $MS90E1/render_result

# --- 4. eval-frame A/B ---------------------------------------------------
step profile_eval_fused_r5 timeout 3600 env FUSED_EMBED=auto $P scripts/profile_eval.py
step profile_eval_off_r5   timeout 3600 $P scripts/profile_eval.py

# --- 5. off-path batch-256 reference ------------------------------------
step bench_ab_off256_r5 timeout 3600 env FUSED_EMBED=off BENCH_BATCH=256 $P bench.py

echo "=== r5b queue done $(date -u +%H:%M:%S)" >> logs_bg/queue_r5b.log
