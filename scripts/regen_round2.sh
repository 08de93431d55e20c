#!/bin/bash
# Round-2 full regeneration after environment reset: artifacts/, logs/
# (gitignored) were wiped, so every matrix cell must be re-preprocessed,
# re-trained, and re-evaluated.  MaiCity now uses the th_dist=0.125 ground
# threshold (pipeline default since 0587ac9).  Ordered so the headline
# PC-NeRF cells finish first.
set -x
cd /root/repo
P=python
R=/root/reference/data
mkdir -p logs_bg

step() {  # step <name> <cmd...>
  local name=$1; shift
  local t0=$SECONDS
  echo "=== [$name] start $(date -u +%H:%M:%S)" >> logs_bg/queue.log
  "$@" >> "logs_bg/${name}.log" 2>&1
  local rc=$?
  echo "=== [$name] rc=$rc dt=$((SECONDS-t0))s" >> logs_bg/queue.log
  return $rc
}

step prep_maicity $P -m pcnerf_tpu.preprocess.pipeline --dataset maicity \
  --root $R/maicity/00/pcd --poses $R/maicity/00/poses.txt \
  --out artifacts/maicity00/maicity_00_1 --start 0 --end 50 \
  --sparsity 20 --crop -12 -12 -2 61 12 0.5

step train_mai_pc $P -m pcnerf_tpu.train.run --preset maicity00_pcnerf \
  --dtype bfloat16 --skip-sanity-val

step eval_mai_pc2 $P scripts/eval_scene.py --preset maicity00 --method 2 \
  --version version_1 --ckpt logs/maicity00/maicity_00_1/pcnerf/checkpoints/best

step prep_kitti $P -m pcnerf_tpu.preprocess.pipeline --dataset kitti \
  --root $R/kitti/00/pcd_remove_dynamic --poses $R/kitti/00/poses.txt \
  --out artifacts/kitti00/1151_1200_view --start 1150 --end 1200 --sparsity 20

step train_kitti_pc $P -m pcnerf_tpu.train.run --preset kitti00_pcnerf \
  --dtype bfloat16 --skip-sanity-val

step eval_kitti_pc2 $P scripts/eval_scene.py --preset kitti00 --method 2 \
  --version version_1 --ckpt logs/kitti00/1151_1200_view/pcnerf/checkpoints/best

step train_mai_orig $P -m pcnerf_tpu.train.run --preset maicity00_originalnerf \
  --dtype bfloat16 --skip-sanity-val

step eval_mai_orig2 $P scripts/eval_scene.py --preset maicity00 --method 2 \
  --version version_0 --ckpt logs/maicity00/maicity_00_1/originalnerf/checkpoints/best

step train_kitti_orig $P -m pcnerf_tpu.train.run --preset kitti00_originalnerf \
  --dtype bfloat16 --skip-sanity-val

step eval_kitti_orig2 $P scripts/eval_scene.py --preset kitti00 --method 2 \
  --version version_0 --ckpt logs/kitti00/1151_1200_view/originalnerf/checkpoints/best

step eval_kitti_pc1 $P scripts/eval_scene.py --preset kitti00 --method 1 \
  --version version_1 --ckpt logs/kitti00/1151_1200_view/pcnerf/checkpoints/best

step eval_mai_pc1 $P scripts/eval_scene.py --preset maicity00 --method 1 \
  --version version_1 --ckpt logs/maicity00/maicity_00_1/pcnerf/checkpoints/best

step prep_mai_s50 $P -m pcnerf_tpu.preprocess.pipeline --dataset maicity \
  --root $R/maicity/00/pcd --poses $R/maicity/00/poses.txt \
  --out artifacts/maicity00/maicity_00_1_s50 --start 0 --end 50 \
  --sparsity 50 --crop -12 -12 -2 61 12 0.5

step train_mai_s50 $P -m pcnerf_tpu.train.run --preset maicity00_pcnerf \
  --sparsity 50 --dtype bfloat16 --skip-sanity-val

step eval_mai_s50 $P scripts/eval_scene.py --preset maicity00 --method 2 \
  --version version_1 --sparsity 50 \
  --ckpt logs/maicity00/maicity_00_1/pcnerf_s50/checkpoints/best

step profile $P scripts/profile_step.py
step bench $P bench.py
echo "=== queue done $(date -u +%H:%M:%S)" >> logs_bg/queue.log
