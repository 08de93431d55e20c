#!/bin/bash
# Round-2 continuation queue after another environment reset (artifacts/ and
# logs/ are gitignored and wiped between builder sessions).  The PC-NeRF
# headline cells were measured last session and their eval logs survive in
# logs_bg/ (git-tracked); this queue fills the still-missing matrix cells:
# bench throughput, MaiCity OriginalNeRF, KITTI OriginalNeRF (3-epoch budget,
# labeled in RESULTS.md).  Ordered cheapest-first so partial completion still
# lands usable numbers.
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

step bench $P bench.py

# preps are CPU-bound and independent: run them concurrently
step prep_maicity $P -m pcnerf_tpu.preprocess.pipeline --dataset maicity \
  --root $R/maicity/00/pcd --poses $R/maicity/00/poses.txt \
  --out artifacts/maicity00/maicity_00_1 --start 0 --end 50 \
  --sparsity 20 --crop -12 -12 -2 61 12 0.5 &
PREP1=$!
step prep_kitti $P -m pcnerf_tpu.preprocess.pipeline --dataset kitti \
  --root $R/kitti/00/pcd_remove_dynamic --poses $R/kitti/00/poses.txt \
  --out artifacts/kitti00/1151_1200_view --start 1150 --end 1200 --sparsity 20 &
PREP2=$!
wait $PREP1 $PREP2

step train_mai_orig $P -m pcnerf_tpu.train.run --preset maicity00_originalnerf \
  --dtype bfloat16 --skip-sanity-val

step eval_mai_orig2 $P scripts/eval_scene.py --preset maicity00 --method 2 \
  --version version_0 --ckpt logs/maicity00/maicity_00_1/originalnerf/checkpoints/best

step train_kitti_orig_e3 $P -m pcnerf_tpu.train.run --preset kitti00_originalnerf \
  --dtype bfloat16 --skip-sanity-val --epochs 3 \
  --out logs/kitti00/1151_1200_view/originalnerf_e3

step eval_kitti_orig2 $P scripts/eval_scene.py --preset kitti00 --method 2 \
  --version version_0 --ckpt logs/kitti00/1151_1200_view/originalnerf_e3/checkpoints/best

# stretch goals if the session is still alive
step train_mai_pc $P -m pcnerf_tpu.train.run --preset maicity00_pcnerf \
  --dtype bfloat16 --skip-sanity-val

step eval_mai_pc1 $P scripts/eval_scene.py --preset maicity00 --method 1 \
  --version version_1 --ckpt logs/maicity00/maicity_00_1/pcnerf/checkpoints/best

echo "=== r2c queue done $(date -u +%H:%M:%S)" >> logs_bg/queue.log
