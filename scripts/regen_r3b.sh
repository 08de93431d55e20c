#!/bin/bash
# Round-3 follow-up queue (launch AFTER regen_r3.sh completes): MaiCity
# PC-NeRF cell attack — finer child grids change both the train-time child
# supervision and the eval-time grouping (cross_ray_join.py showed the CD
# deficit concentrates where the child sets disagree).
set -x
cd /root/repo
P=python

step() {
  local name=$1; shift
  local t0=$SECONDS
  echo "=== [$name] start $(date -u +%H:%M:%S)" >> logs_bg/queue.log
  "$@" >> "logs_bg/${name}.log" 2>&1
  local rc=$?
  echo "=== [$name] rc=$rc dt=$((SECONDS-t0))s" >> logs_bg/queue.log
  return $rc
}
trained() { [ -e "$1/DONE" ]; }
evaled() { grep -q '"cd"' "logs_bg/$1.log" 2>/dev/null; }

for c in c45 c40; do
  ART=artifacts/maicity00/maicity_00_1_${c}
  OUT=logs/maicity00/maicity_00_1/pcnerf_${c}
  trained $OUT || \
  step train_mai_${c} timeout 3600 $P -m pcnerf_tpu.train.run \
    --preset maicity00_pcnerf --dtype bfloat16 --skip-sanity-val \
    --art-dir $ART --out $OUT
  evaled eval_mai_${c} || \
  step eval_mai_${c} timeout 5400 $P scripts/eval_scene.py --preset maicity00 \
    --method 2 --version version_1 --art-dir $ART --ckpt $OUT/checkpoints/best
done

# denser-sampling training candidate for the MaiCity cell: same data, same
# 1-epoch budget, 1024+2048 samples/ray (a framework-side quality knob the
# TPU step cost affords; eval settings unchanged)
MAI_DS=logs/maicity00/maicity_00_1/pcnerf_dense
trained $MAI_DS || \
step train_mai_dense timeout 3600 $P -m pcnerf_tpu.train.run \
  --preset maicity00_pcnerf --dtype bfloat16 --skip-sanity-val \
  --n-samples 1024 --n-importance 2048 --out $MAI_DS
evaled eval_mai_dense || \
step eval_mai_dense timeout 5400 $P scripts/eval_scene.py --preset maicity00 \
  --method 2 --version version_1 --ckpt $MAI_DS/checkpoints/best \
  --result-dir artifacts/maicity00/maicity_00_1/render_result_dense

# KITTI OriginalNeRF one-step (BASELINE.md: ref 3.5517 / 0.0089) — the last
# ablation row the reference ships artifacts for
evaled eval_kitti_orig1 || \
step eval_kitti_orig1 timeout 7200 $P scripts/eval_scene.py --preset kitti00 \
  --method 1 --version version_0 \
  --ckpt logs/kitti00/1151_1200_view/originalnerf/checkpoints/best

# third sparsity point: 67% (test frames = 2/3 of the sequence)
MAI_S67=logs/maicity00/maicity_00_1/pcnerf_s67
trained $MAI_S67 || \
step train_mai_s67 timeout 3600 $P -m pcnerf_tpu.train.run \
  --preset maicity00_pcnerf --sparsity 67 --dtype bfloat16 --skip-sanity-val
evaled eval_mai_s67 || \
step eval_mai_s67 timeout 7200 $P scripts/eval_scene.py --preset maicity00 \
  --method 2 --version version_1 --sparsity 67 --ckpt $MAI_S67/checkpoints/best

# Pallas eval kernel + remat train variant, compiled on the real TPU
grep -q "pallas_ms" logs_bg/pallas_tpu_r3.log 2>/dev/null || \
step pallas_tpu_r3 timeout 3600 $P scripts/pallas_tpu_check.py

# single-chip batch-scaling curve (the one-chip stand-in for the scaling
# table; the virtual-mesh functional curve is bench_scaling --virtual 8)
grep -q '"batch": 4096' logs_bg/bench_curve_r3.log 2>/dev/null || \
for B in 256 512 1024 2048 4096; do
  step bench_curve_r3 timeout 1800 env BENCH_BATCH=$B $P bench.py
done

echo "=== r3b queue done $(date -u +%H:%M:%S)" >> logs_bg/queue.log
