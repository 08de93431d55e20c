#!/bin/bash
# Full honest-results eval queue: all 4 matrix cells (exact-NN metrics),
# one-step rows, 50% sparsity, then perf profiling + bench.
set -x
cd /root/repo
P=python

$P scripts/eval_scene.py --preset maicity00 --method 2 --version version_1 \
  --ckpt logs/maicity00/maicity_00_1/pcnerf/checkpoints/best
$P scripts/eval_scene.py --preset kitti00 --method 2 --version version_1 \
  --ckpt logs/kitti00/1151_1200_view/pcnerf/checkpoints/best
$P scripts/eval_scene.py --preset maicity00 --method 2 --version version_0 \
  --ckpt logs/maicity00/maicity_00_1/originalnerf/checkpoints/best
$P scripts/eval_scene.py --preset kitti00 --method 2 --version version_0 \
  --ckpt logs/kitti00/1151_1200_view/originalnerf/checkpoints/best
$P scripts/eval_scene.py --preset kitti00 --method 1 --version version_1 \
  --ckpt logs/kitti00/1151_1200_view/pcnerf/checkpoints/best
$P scripts/eval_scene.py --preset maicity00 --method 1 --version version_1 \
  --ckpt logs/maicity00/maicity_00_1/pcnerf/checkpoints/best
$P scripts/eval_scene.py --preset maicity00 --method 2 --version version_1 --sparsity 50 \
  --ckpt logs/maicity00/maicity_00_1/pcnerf_s50/checkpoints/best
$P scripts/profile_step.py
$P bench.py
