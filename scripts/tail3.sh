#!/bin/bash
# Final stretch: MaiCity th135 headline cell, then the remaining matrix cells.
set -x
cd /root/repo
P=python
step() {
  local name=$1; shift
  local t0=$SECONDS
  echo "=== [$name] start $(date -u +%H:%M:%S)" >> logs_bg/queue.log
  "$@" >> "logs_bg/${name}.log" 2>&1
  echo "=== [$name] rc=$? dt=$((SECONDS-t0))s" >> logs_bg/queue.log
}
while kill -0 "$1" 2>/dev/null; do sleep 10; done

step train_mai_pc_135 $P -m pcnerf_tpu.train.run --preset maicity00_pcnerf \
  --dtype bfloat16 --skip-sanity-val
step eval_mai_pc2_135 $P scripts/eval_scene.py --preset maicity00 --method 2 \
  --version version_1 --ckpt logs/maicity00/maicity_00_1/pcnerf/checkpoints/best
step eval_kitti_orig2 $P scripts/eval_scene.py --preset kitti00 --method 2 \
  --version version_0 --ckpt logs/kitti00/1151_1200_view/originalnerf_e3/checkpoints/best
step train_mai_orig_135 $P -m pcnerf_tpu.train.run --preset maicity00_originalnerf \
  --dtype bfloat16 --skip-sanity-val
step eval_mai_orig2_135 $P scripts/eval_scene.py --preset maicity00 --method 2 \
  --version version_0 --ckpt logs/maicity00/maicity_00_1/originalnerf/checkpoints/best
step eval_kitti_pc1 $P scripts/eval_scene.py --preset kitti00 --method 1 \
  --version version_1 --ckpt logs/kitti00/1151_1200_view/pcnerf/checkpoints/best
step profile $P scripts/profile_step.py
step bench $P bench.py
echo "=== tail3 done $(date -u +%H:%M:%S)" >> logs_bg/queue.log
