#!/bin/bash
# Carry-over queue: run only what is still missing after regen_r2c3.sh
# (guards on the outputs).  Safe to run on a freshly re-provisioned machine:
# preps rebuild from /root/reference/data, and committed saved_logs/ best
# checkpoints let evals run without retraining — restore them with
#   cp -r saved_logs/. logs/
# before launching if logs/ is empty.
set -x
cd /root/repo
P=python
R=/root/reference/data

step() {
  local name=$1; shift
  local t0=$SECONDS
  echo "=== [$name] start $(date -u +%H:%M:%S)" >> logs_bg/queue.log
  "$@" >> "logs_bg/${name}.log" 2>&1
  local rc=$?
  echo "=== [$name] rc=$rc dt=$((SECONDS-t0))s" >> logs_bg/queue.log
  return $rc
}

have() { [ -e "$1" ]; }

# restore mirrored checkpoints if logs/ was wiped
[ -d logs ] || { mkdir -p logs; cp -r saved_logs/. logs/ 2>/dev/null; rm -f logs/.gitkeep logs/.stamp logs/.stamp.next; }

# preps
have artifacts/maicity00/maicity_00_1/sub_pointcloud/split_child_nerf2/1.pcd || \
step prep_maicity $P -m pcnerf_tpu.preprocess.pipeline --dataset maicity \
  --root $R/maicity/00/pcd --poses $R/maicity/00/poses.txt \
  --out artifacts/maicity00/maicity_00_1 --start 0 --end 50 \
  --sparsity 20 --crop -12 -12 -2 61 12 0.5 &
A=$!
have artifacts/kitti00/1151_1200_view/sub_pointcloud/split_child_nerf2/1.pcd || \
step prep_kitti $P -m pcnerf_tpu.preprocess.pipeline --dataset kitti \
  --root $R/kitti/00/pcd_remove_dynamic --poses $R/kitti/00/poses.txt \
  --out artifacts/kitti00/1151_1200_view --start 1150 --end 1200 --sparsity 20 &
B=$!
have artifacts/maicity00/maicity_00_1_s50/sub_pointcloud/split_child_nerf2/1.pcd || \
step prep_mai_s50 $P -m pcnerf_tpu.preprocess.pipeline --dataset maicity \
  --root $R/maicity/00/pcd --poses $R/maicity/00/poses.txt \
  --out artifacts/maicity00/maicity_00_1_s50 --start 0 --end 50 \
  --sparsity 50 --crop -12 -12 -2 61 12 0.5 &
C=$!
wait $A $B $C

# --- 50% sparsity row ---
grep -q '"cd"' logs_bg/eval_mai_s50.log 2>/dev/null || {
  have logs/maicity00/maicity_00_1/pcnerf_s50/checkpoints/best/d || \
  step train_mai_s50 $P -m pcnerf_tpu.train.run --preset maicity00_pcnerf \
    --sparsity 50 --dtype bfloat16 --skip-sanity-val
  step eval_mai_s50 $P scripts/eval_scene.py --preset maicity00 --method 2 \
    --version version_1 --sparsity 50 \
    --ckpt logs/maicity00/maicity_00_1/pcnerf_s50/checkpoints/best
}

# --- one-step ablation row (needs the pcnerf checkpoint) ---
grep -q '"cd"' logs_bg/eval_mai_pc1.log 2>/dev/null || {
  have logs/maicity00/maicity_00_1/pcnerf/checkpoints/best/d || \
  step train_mai_pc $P -m pcnerf_tpu.train.run --preset maicity00_pcnerf \
    --dtype bfloat16 --skip-sanity-val
  step eval_mai_pc1 $P scripts/eval_scene.py --preset maicity00 --method 1 \
    --version version_1 --ckpt logs/maicity00/maicity_00_1/pcnerf/checkpoints/best
}

# --- KITTI OriginalNeRF 3-epoch cell ---
grep -q '"cd"' logs_bg/eval_kitti_orig2.log 2>/dev/null || {
  have logs/kitti00/1151_1200_view/originalnerf_e3/checkpoints/best/d || \
  step train_kitti_orig_e3 $P -m pcnerf_tpu.train.run --preset kitti00_originalnerf \
    --dtype bfloat16 --skip-sanity-val --epochs 3 \
    --out logs/kitti00/1151_1200_view/originalnerf_e3
  step eval_kitti_orig2 $P scripts/eval_scene.py --preset kitti00 --method 2 \
    --version version_0 --ckpt logs/kitti00/1151_1200_view/originalnerf_e3/checkpoints/best
}

# --- component profile (PERF.md table) ---
grep -q "component" logs_bg/profile.log 2>/dev/null || \
step profile $P scripts/profile_step.py

step bench $P bench.py

echo "=== r2c4 queue done $(date -u +%H:%M:%S)" >> logs_bg/queue.log
