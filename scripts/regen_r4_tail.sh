#!/bin/bash
# Round-4 tail queue (pass 4): the remaining VERDICT items, reprioritized
# for the wall-clock left — headline voxel-raycast baselines (#3), the
# multi-block rendered metrics (#5), the 80%-sparsity probes + voxel floor
# (#4), then the s67 voxel anchor, throughput run (#6) and the batch curve
# (#8, most cuttable).  Same guards as regen_r4.sh.
set -x
cd /root/repo
P=python
R=/root/reference/data
mkdir -p logs_bg logs

step() {
  local name=$1; shift
  local t0=$SECONDS
  echo "=== [$name] start $(date -u +%H:%M:%S)" >> logs_bg/queue_r4tail.log
  "$@" >> "logs_bg/${name}.log" 2>&1
  local rc=$?
  echo "=== [$name] rc=$rc dt=$((SECONDS-t0))s" >> logs_bg/queue_r4tail.log
  return $rc
}
trained() { [ -e "$1/DONE" ]; }
evaled() { grep -q '"cd"' "logs_bg/$1.log" 2>/dev/null; }

MAI=logs/maicity00/maicity_00_1

# --- 1. headline voxel-raycast baselines (VERDICT #3) --------------------
grep -q '"voxel": 0.5' logs_bg/voxbase_kitti_r4.log 2>/dev/null || \
step voxbase_kitti_r4 timeout 10800 $P scripts/voxel_baseline.py \
  --preset kitti00 --voxels 0.75 0.5
grep -q '"voxel": 0.5' logs_bg/voxbase_mai_r4.log 2>/dev/null || \
step voxbase_mai_r4 timeout 10800 $P scripts/voxel_baseline.py \
  --preset maicity00 --voxels 0.75 0.5

# --- 3. 80%-sparsity collapse probes + voxel floor (VERDICT #4) ----------
S80E3=$MAI/pcnerf_s80_e3
trained $S80E3 || \
step train_mai_s80_e3_r4 timeout 5400 $P -m pcnerf_tpu.train.run \
  --preset maicity00_pcnerf --sparsity 80 --dtype bfloat16 --skip-sanity-val \
  --epochs 3 --out $S80E3 --resume
evaled eval_mai_s80_e3_r4 || \
step eval_mai_s80_e3_r4 timeout 10800 $P scripts/eval_scene.py \
  --preset maicity00 --method 2 --version version_1 --sparsity 80 \
  --ckpt $S80E3/checkpoints/best --result-dir $S80E3/render_result
grep -q '"voxel": 0.5' logs_bg/voxbase_mai_s80_r4.log 2>/dev/null || \
step voxbase_mai_s80_r4 timeout 7200 $P scripts/voxel_baseline.py \
  --preset maicity00 --sparsity 80 --voxels 0.5

# --- 2. multi-block with rendered per-block metrics (VERDICT #5) ---------
grep -q "metrics" logs_bg/multiblock_r4.log 2>/dev/null || \
step multiblock_r4 timeout 14400 $P -m pcnerf_tpu.tools.multi_block \
  --dataset kitti --root $R/kitti/00/pcd_remove_dynamic \
  --poses $R/kitti/00/poses.txt --out artifacts/kitti00_blocks \
  --start 1150 --end 1200 --block-frames 25 --dtype bfloat16

S80C40=$MAI/pcnerf_s80_c40
trained $S80C40 || \
step train_mai_s80_c40_r4 timeout 5400 $P -m pcnerf_tpu.train.run \
  --preset maicity00_pcnerf --sparsity 80 --dtype bfloat16 --skip-sanity-val \
  --art-dir artifacts/maicity00/maicity_00_1_s80c40 --out $S80C40
evaled eval_mai_s80_c40_r4 || \
step eval_mai_s80_c40_r4 timeout 10800 $P scripts/eval_scene.py \
  --preset maicity00 --method 2 --version version_1 --sparsity 80 \
  --art-dir artifacts/maicity00/maicity_00_1_s80c40 \
  --ckpt $S80C40/checkpoints/best --result-dir $S80C40/render_result
# --- 4. s67 voxel anchor + throughput run + batch curve ------------------
grep -q '"voxel": 0.5' logs_bg/voxbase_mai_s67_r4.log 2>/dev/null || \
step voxbase_mai_s67_r4 timeout 7200 $P scripts/voxel_baseline.py \
  --preset maicity00 --sparsity 67 --voxels 0.5
TPUT=$MAI/pcnerf_b1024_r4
trained $TPUT || \
step train_mai_tput_r4 timeout 3600 $P -m pcnerf_tpu.train.run \
  --preset maicity00_pcnerf --dtype bfloat16 --skip-sanity-val \
  --batch-size 1024 --out $TPUT
grep -q '"batch": 4096' logs_bg/bench_curve_r4.log 2>/dev/null || \
for B in 256 512 2048 4096; do
  step bench_curve_r4 timeout 2400 env BENCH_BATCH=$B $P bench.py
done

echo "=== r4 tail done $(date -u +%H:%M:%S)" >> logs_bg/queue_r4tail.log
