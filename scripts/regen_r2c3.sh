#!/bin/bash
# Queue v3 (session 3 of round 2).  The machine was re-provisioned between
# sessions: artifacts/ and logs/ (gitignored) were lost, so every open matrix
# cell needs its preprocessing + training + eval re-run.  Ordering is
# value-per-minute: the MaiCity OriginalNeRF cell (last losing MaiCity cell,
# expected to flip with the th_dist=0.125 preprocessing) first, then bench,
# then the 50%-sparsity robustness row, then one-step rows, then KITTI
# OriginalNeRF 3-epoch (its training finished last session — see
# logs_bg/train_kitti_orig_e3.log — but the checkpoint was lost before eval).
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

# --- preps (CPU, parallel) ---
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
[ -f artifacts/maicity00/maicity_00_1_s50/all_rays.npy ] || \
step prep_mai_s50 $P -m pcnerf_tpu.preprocess.pipeline --dataset maicity \
  --root $R/maicity/00/pcd --poses $R/maicity/00/poses.txt \
  --out artifacts/maicity00/maicity_00_1_s50 --start 0 --end 50 \
  --sparsity 50 --crop -12 -12 -2 61 12 0.5 &
PREP3=$!
wait $PREP1 $PREP2 $PREP3

# --- TPU, serial, highest value first ---
step train_mai_orig $P -m pcnerf_tpu.train.run --preset maicity00_originalnerf \
  --dtype bfloat16 --skip-sanity-val

step eval_mai_orig2 $P scripts/eval_scene.py --preset maicity00 --method 2 \
  --version version_0 --ckpt logs/maicity00/maicity_00_1/originalnerf/checkpoints/best

step bench $P bench.py

step train_mai_s50 $P -m pcnerf_tpu.train.run --preset maicity00_pcnerf \
  --sparsity 50 --dtype bfloat16 --skip-sanity-val

step eval_mai_s50 $P scripts/eval_scene.py --preset maicity00 --method 2 \
  --version version_1 --sparsity 50 \
  --ckpt logs/maicity00/maicity_00_1/pcnerf_s50/checkpoints/best

step train_mai_pc $P -m pcnerf_tpu.train.run --preset maicity00_pcnerf \
  --dtype bfloat16 --skip-sanity-val

step eval_mai_pc1 $P scripts/eval_scene.py --preset maicity00 --method 1 \
  --version version_1 --ckpt logs/maicity00/maicity_00_1/pcnerf/checkpoints/best

step train_kitti_orig_e3 $P -m pcnerf_tpu.train.run --preset kitti00_originalnerf \
  --dtype bfloat16 --skip-sanity-val --epochs 3 \
  --out logs/kitti00/1151_1200_view/originalnerf_e3

step eval_kitti_orig2 $P scripts/eval_scene.py --preset kitti00 --method 2 \
  --version version_0 --ckpt logs/kitti00/1151_1200_view/originalnerf_e3/checkpoints/best

step profile $P scripts/profile_step.py

echo "=== r2c3 queue done $(date -u +%H:%M:%S)" >> logs_bg/queue.log
