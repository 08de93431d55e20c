#!/bin/bash
# Round-3c queue (fresh provisioning): restore surviving checkpoints from
# saved_logs/, regenerate the gitignored artifacts/, then close every
# remaining RESULTS.md hole in priority order.
#
# Priorities (VERDICT r2 "Next round"):
#   1. re-measure the 50%-sparsity eval whose committed log was cut at
#      frame 2 (the published number currently has NO backing log);
#   2. KITTI PC-NeRF retrain + the one-step ablation row (ref 1.6204/0.1782)
#      + the two-step re-measure (also rebuilds the golden-test fixtures);
#   3. KITTI OriginalNeRF cell (currently loses, ref 0.2201/0.8904);
#   4. perf: profile_step component table + Pallas-on-TPU check;
#   5. sparsity points 80% and 67%;
#   6. KITTI OriginalNeRF 3-epoch variant;
#   7. bench + batch-scaling curve.
#
# Guards: trainings skip on <out>/DONE; preps skip on preprocess_meta.json;
# evals skip on a '"cd"' line in their own log.  All TPU jobs under timeout.
set -x
cd /root/repo
P=python
R=/root/reference/data
mkdir -p logs_bg logs

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
trained() { [ -e "$1/DONE" ]; }
evaled() { grep -q '"cd"' "logs_bg/$1.log" 2>/dev/null; }

# --- 0. restore checkpoints that survived re-provisioning -----------------
cp -prn saved_logs/maicity00 logs/ 2>/dev/null || true

# --- 1. preps (CPU, parallel) ---------------------------------------------
prep_mai() {  # prep_mai <suffix> <sparsity>
  local out=artifacts/maicity00/maicity_00_1$1
  have $out/preprocess_meta.json || \
  step prep_mai$1 $P -m pcnerf_tpu.preprocess.pipeline --dataset maicity \
    --root $R/maicity/00/pcd --poses $R/maicity/00/poses.txt \
    --out $out --start 0 --end 50 --sparsity $2 --crop -12 -12 -2 61 12 0.5
}
prep_mai ""     20 &
prep_mai _s50   50 &
prep_mai _s80   80 &
prep_mai _s67   67 &
have artifacts/kitti00/1151_1200_view/preprocess_meta.json || \
step prep_kitti $P -m pcnerf_tpu.preprocess.pipeline --dataset kitti \
  --root $R/kitti/00/pcd_remove_dynamic --poses $R/kitti/00/poses.txt \
  --out artifacts/kitti00/1151_1200_view --start 1150 --end 1200 --sparsity 20 &
wait

# --- 2. the unbacked 50%-sparsity number ----------------------------------
MAI_S50=logs/maicity00/maicity_00_1/pcnerf_s50
trained $MAI_S50 || \
step train_mai_s50_r3c timeout 3600 $P -m pcnerf_tpu.train.run \
  --preset maicity00_pcnerf --sparsity 50 --dtype bfloat16 --skip-sanity-val \
  --resume
evaled eval_mai_s50_r3c || \
step eval_mai_s50_r3c timeout 5400 $P scripts/eval_scene.py --preset maicity00 \
  --method 2 --version version_1 --sparsity 50 --ckpt $MAI_S50/checkpoints/best

# --- 3. KITTI PC-NeRF: retrain, one-step row, two-step re-measure ---------
KIT_PC=logs/kitti00/1151_1200_view/pcnerf
trained $KIT_PC || \
step train_kitti_pc_r3c timeout 5400 $P -m pcnerf_tpu.train.run \
  --preset kitti00_pcnerf --dtype bfloat16 --skip-sanity-val --resume
evaled eval_kitti_pc1_r3c || \
step eval_kitti_pc1_r3c timeout 7200 $P scripts/eval_scene.py --preset kitti00 \
  --method 1 --version version_1 --ckpt $KIT_PC/checkpoints/best
evaled eval_kitti_pc2_r3c || \
step eval_kitti_pc2_r3c timeout 7200 $P scripts/eval_scene.py --preset kitti00 \
  --method 2 --version version_1 --ckpt $KIT_PC/checkpoints/best

# --- 4. KITTI OriginalNeRF cell (1-epoch protocol) ------------------------
KIT_OR=logs/kitti00/1151_1200_view/originalnerf
trained $KIT_OR || \
step train_kitti_orig_r3c timeout 5400 $P -m pcnerf_tpu.train.run \
  --preset kitti00_originalnerf --dtype bfloat16 --skip-sanity-val --resume
evaled eval_kitti_orig2_r3c || \
step eval_kitti_orig2_r3c timeout 7200 $P scripts/eval_scene.py --preset kitti00 \
  --method 2 --version version_0 --ckpt $KIT_OR/checkpoints/best

# --- 5. perf: component profile + Pallas on the real TPU ------------------
grep -q "component" logs_bg/profile_r3.log 2>/dev/null || \
step profile_r3 timeout 7200 $P scripts/profile_step.py
grep -q "pallas_ms" logs_bg/pallas_tpu_r3.log 2>/dev/null || \
step pallas_tpu_r3 timeout 3600 $P scripts/pallas_tpu_check.py

# --- 6. sparsity points 80% and 67% ---------------------------------------
for S in 80 67; do
  OUT=logs/maicity00/maicity_00_1/pcnerf_s$S
  trained $OUT || \
  step train_mai_s${S}_r3c timeout 3600 $P -m pcnerf_tpu.train.run \
    --preset maicity00_pcnerf --sparsity $S --dtype bfloat16 --skip-sanity-val
  evaled eval_mai_s${S}_r3c || \
  step eval_mai_s${S}_r3c timeout 7200 $P scripts/eval_scene.py \
    --preset maicity00 --method 2 --version version_1 --sparsity $S \
    --ckpt $OUT/checkpoints/best
done

# --- 7. KITTI OriginalNeRF 3-epoch variant --------------------------------
KIT_OR3=logs/kitti00/1151_1200_view/originalnerf_e3
trained $KIT_OR3 || \
step train_kitti_orig_e3_r3c timeout 9000 $P -m pcnerf_tpu.train.run \
  --preset kitti00_originalnerf --dtype bfloat16 --skip-sanity-val --epochs 3 \
  --out $KIT_OR3 --resume
evaled eval_kitti_orig2_e3_r3c || \
step eval_kitti_orig2_e3_r3c timeout 7200 $P scripts/eval_scene.py \
  --preset kitti00 --method 2 --version version_0 --ckpt $KIT_OR3/checkpoints/best

# --- 8. bench + single-chip batch-scaling curve ---------------------------
step bench_r3 timeout 3600 $P bench.py
grep -q '"batch": 4096' logs_bg/bench_curve_r3.log 2>/dev/null || \
for B in 256 512 1024 2048 4096; do
  step bench_curve_r3 timeout 1800 env BENCH_BATCH=$B $P bench.py
done

echo "=== r3c queue done $(date -u +%H:%M:%S)" >> logs_bg/queue.log
