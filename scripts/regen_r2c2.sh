#!/bin/bash
# Queue v2 (supersedes regen_r2c.sh's tail): insert the PERF.md profiling run
# (referenced from RESULTS/PARITY/config but never generated — the previous
# session was killed before its profile step), then the missing OriginalNeRF
# matrix cells, highest-expected-value first.  MaiCity OriginalNeRF goes
# before KITTI: the th_dist=0.125 preprocessing fix that took MaiCity PC-NeRF
# from CD 0.2220 to 0.1827 should move the OriginalNeRF cell (round-1 0.3021
# vs ref 0.2973) by a similar margin.
set -x
cd /root/repo
P=python
R=/root/reference/data

step() {  # step <name> <cmd...>
  local name=$1; shift
  local t0=$SECONDS
  echo "=== [$name] start $(date -u +%H:%M:%S)" >> logs_bg/queue.log
  "$@" >> "logs_bg/${name}.log" 2>&1
  local rc=$?
  echo "=== [$name] rc=$rc dt=$((SECONDS-t0))s" >> logs_bg/queue.log
  return $rc
}

# preps (CPU) if the v1 queue didn't get to them
[ -f artifacts/maicity00/maicity_00_1/all_rays.npy ] || \
step prep_maicity $P -m pcnerf_tpu.preprocess.pipeline --dataset maicity \
  --root $R/maicity/00/pcd --poses $R/maicity/00/poses.txt \
  --out artifacts/maicity00/maicity_00_1 --start 0 --end 50 \
  --sparsity 20 --crop -12 -12 -2 61 12 0.5 &
PREP1=$!
[ -f artifacts/kitti00/1151_1200_view/all_rays.npy ] || \
step prep_kitti $P -m pcnerf_tpu.preprocess.pipeline --dataset kitti \
  --root $R/kitti/00/pcd_remove_dynamic --poses $R/kitti/00/poses.txt \
  --out artifacts/kitti00/1151_1200_view --start 1150 --end 1200 --sparsity 20 &
PREP2=$!

wait $PREP1 $PREP2

# remote compiles are degraded (~100 s for a tiny jit at 01:10 UTC), so the
# highest-value run goes first and profiling (many separate jits) last
step train_mai_orig $P -m pcnerf_tpu.train.run --preset maicity00_originalnerf \
  --dtype bfloat16 --skip-sanity-val

step eval_mai_orig2 $P scripts/eval_scene.py --preset maicity00 --method 2 \
  --version version_0 --ckpt logs/maicity00/maicity_00_1/originalnerf/checkpoints/best

step bench $P bench.py

step profile $P scripts/profile_step.py

step train_kitti_orig_e3 $P -m pcnerf_tpu.train.run --preset kitti00_originalnerf \
  --dtype bfloat16 --skip-sanity-val --epochs 3 \
  --out logs/kitti00/1151_1200_view/originalnerf_e3

step eval_kitti_orig2 $P scripts/eval_scene.py --preset kitti00 --method 2 \
  --version version_0 --ckpt logs/kitti00/1151_1200_view/originalnerf_e3/checkpoints/best

# stretch goals
step train_mai_pc $P -m pcnerf_tpu.train.run --preset maicity00_pcnerf \
  --dtype bfloat16 --skip-sanity-val

step eval_mai_pc1 $P scripts/eval_scene.py --preset maicity00 --method 1 \
  --version version_1 --ckpt logs/maicity00/maicity_00_1/pcnerf/checkpoints/best

# sparsity robustness row (50% prep already built on CPU this session)
step train_mai_s50 $P -m pcnerf_tpu.train.run --preset maicity00_pcnerf \
  --sparsity 50 --dtype bfloat16 --skip-sanity-val

step eval_mai_s50 $P scripts/eval_scene.py --preset maicity00 --method 2 \
  --version version_1 --sparsity 50 \
  --ckpt logs/maicity00/maicity_00_1/pcnerf_s50/checkpoints/best

echo "=== r2c2 queue done $(date -u +%H:%M:%S)" >> logs_bg/queue.log
