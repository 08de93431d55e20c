#!/bin/bash
# Swap in the th_dist=0.125 MaiCity artifacts, retrain all MaiCity models,
# re-evaluate every MaiCity row of the results matrix.
set -x
cd /root/repo
mv artifacts/maicity00/maicity_00_1 artifacts/maicity00/maicity_00_1_th300
mv artifacts/maicity00/maicity_00_1_stage artifacts/maicity00/maicity_00_1
mv artifacts/maicity00/maicity_00_1_s50 artifacts/maicity00/maicity_00_1_s50_th300
mv artifacts/maicity00/maicity_00_1_s50_stage artifacts/maicity00/maicity_00_1_s50
# fresh experiment dirs (keep the th300 runs for provenance)
for d in pcnerf originalnerf pcnerf_s50; do
  [ -d logs/maicity00/maicity_00_1/$d ] && \
    mv logs/maicity00/maicity_00_1/$d logs/maicity00/maicity_00_1/${d}_th300
done
P=python
$P -m pcnerf_tpu.train.run --preset maicity00_pcnerf --dtype bfloat16
$P -m pcnerf_tpu.train.run --preset maicity00_originalnerf --dtype bfloat16
$P -m pcnerf_tpu.train.run --preset maicity00_pcnerf --sparsity 50 --dtype bfloat16
$P scripts/eval_scene.py --preset maicity00 --method 2 --version version_1 \
  --ckpt logs/maicity00/maicity_00_1/pcnerf/checkpoints/best
$P scripts/eval_scene.py --preset maicity00 --method 2 --version version_0 \
  --ckpt logs/maicity00/maicity_00_1/originalnerf/checkpoints/best
$P scripts/eval_scene.py --preset maicity00 --method 1 --version version_1 \
  --ckpt logs/maicity00/maicity_00_1/pcnerf/checkpoints/best
$P scripts/eval_scene.py --preset maicity00 --method 2 --version version_1 --sparsity 50 \
  --ckpt logs/maicity00/maicity_00_1/pcnerf_s50/checkpoints/best
