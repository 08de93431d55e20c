#!/bin/bash
# Round-3 unified queue (replaces regen_r3c.sh's tail after its driver was
# stopped; the in-flight KITTI PC-NeRF training it launched keeps running
# and is awaited via its DONE sentinel).  Reprioritized so that the
# integrity-critical and headline items land first and the perf block runs
# mid-round under clean conditions:
#   1. KITTI one-step ablation row (ref 1.6204/0.1782)
#   2. MaiCity 50%-sparsity retrain+eval (restored ckpt was corrupt)
#   3. KITTI two-step re-measure (also rebuilds golden-test fixtures)
#   4. KITTI OriginalNeRF cell (currently loses)
#   5. perf: profile_step + pallas-on-TPU + bench
#   6. MaiCity cell attack: cell=0.45 child grid (crossjoin: deficit sits on
#      group-disagreement rays -> geometry is the lever)
#   7. sparsity 80% + 67% rows
#   8. one-step OriginalNeRF rows (KITTI + MaiCity)
#   9. multi-block: KITTI as 2x25-frame blocks, one command
#  10. stretch: c40, dense-sampling variant, orig 3-epoch, bench curve
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

# --- CPU preps for later stages, in parallel now --------------------------
have artifacts/maicity00/maicity_00_1_c45/preprocess_meta.json || \
step prep_mai_c45 $P -m pcnerf_tpu.preprocess.pipeline --dataset maicity \
  --root $R/maicity/00/pcd --poses $R/maicity/00/poses.txt \
  --out artifacts/maicity00/maicity_00_1_c45 --start 0 --end 50 \
  --sparsity 20 --cell 0.45 --crop -12 -12 -2 61 12 0.5 &
have artifacts/maicity00/maicity_00_1_c40/preprocess_meta.json || \
step prep_mai_c40 $P -m pcnerf_tpu.preprocess.pipeline --dataset maicity \
  --root $R/maicity/00/pcd --poses $R/maicity/00/poses.txt \
  --out artifacts/maicity00/maicity_00_1_c40 --start 0 --end 50 \
  --sparsity 20 --cell 0.40 --crop -12 -12 -2 61 12 0.5 &

# --- await the in-flight KITTI PC-NeRF training ---------------------------
KIT_PC=logs/kitti00/1151_1200_view/pcnerf
for i in $(seq 1 360); do
  trained $KIT_PC && break
  sleep 15
done
trained $KIT_PC || \
step train_kitti_pc_r3f timeout 5400 $P -m pcnerf_tpu.train.run \
  --preset kitti00_pcnerf --dtype bfloat16 --skip-sanity-val --resume

# --- 1. KITTI one-step ablation row ---------------------------------------
evaled eval_kitti_pc1_r3c || \
step eval_kitti_pc1_r3c timeout 7200 $P scripts/eval_scene.py --preset kitti00 \
  --method 1 --version version_1 --ckpt $KIT_PC/checkpoints/best

# --- 2. MaiCity 50% sparsity: retrain (mirror was corrupt) + eval ---------
MAI_S50=logs/maicity00/maicity_00_1/pcnerf_s50
trained $MAI_S50 || \
step train_mai_s50_r3f timeout 3600 $P -m pcnerf_tpu.train.run \
  --preset maicity00_pcnerf --sparsity 50 --dtype bfloat16 --skip-sanity-val
evaled eval_mai_s50_r3f || \
step eval_mai_s50_r3f timeout 5400 $P scripts/eval_scene.py --preset maicity00 \
  --method 2 --version version_1 --sparsity 50 --ckpt $MAI_S50/checkpoints/best

# --- 3. KITTI two-step re-measure (rebuilds golden fixtures) --------------
evaled eval_kitti_pc2_r3c || \
step eval_kitti_pc2_r3c timeout 7200 $P scripts/eval_scene.py --preset kitti00 \
  --method 2 --version version_1 --ckpt $KIT_PC/checkpoints/best

# --- 4. KITTI OriginalNeRF cell -------------------------------------------
KIT_OR=logs/kitti00/1151_1200_view/originalnerf
trained $KIT_OR || \
step train_kitti_orig_r3c timeout 5400 $P -m pcnerf_tpu.train.run \
  --preset kitti00_originalnerf --dtype bfloat16 --skip-sanity-val --resume
evaled eval_kitti_orig2_r3c || \
step eval_kitti_orig2_r3c timeout 7200 $P scripts/eval_scene.py --preset kitti00 \
  --method 2 --version version_0 --ckpt $KIT_OR/checkpoints/best

# --- 5. perf block --------------------------------------------------------
grep -q "component" logs_bg/profile_r3.log 2>/dev/null || \
step profile_r3 timeout 7200 $P scripts/profile_step.py
grep -q "pallas_ms" logs_bg/pallas_tpu_r3.log 2>/dev/null || \
step pallas_tpu_r3 timeout 3600 $P scripts/pallas_tpu_check.py
step bench_r3 timeout 3600 $P bench.py

# --- 6. MaiCity cell attack: finer child grid -----------------------------
wait   # preps
C45=logs/maicity00/maicity_00_1/pcnerf_c45
trained $C45 || \
step train_mai_c45 timeout 3600 $P -m pcnerf_tpu.train.run \
  --preset maicity00_pcnerf --dtype bfloat16 --skip-sanity-val \
  --art-dir artifacts/maicity00/maicity_00_1_c45 --out $C45
evaled eval_mai_c45 || \
step eval_mai_c45 timeout 5400 $P scripts/eval_scene.py --preset maicity00 \
  --method 2 --version version_1 --art-dir artifacts/maicity00/maicity_00_1_c45 \
  --ckpt $C45/checkpoints/best

# --- 7. sparsity rows 80% and 67% -----------------------------------------
for S in 80 67; do
  OUT=logs/maicity00/maicity_00_1/pcnerf_s$S
  trained $OUT || \
  step train_mai_s${S}_r3f timeout 3600 $P -m pcnerf_tpu.train.run \
    --preset maicity00_pcnerf --sparsity $S --dtype bfloat16 --skip-sanity-val
  evaled eval_mai_s${S}_r3f || \
  step eval_mai_s${S}_r3f timeout 7200 $P scripts/eval_scene.py \
    --preset maicity00 --method 2 --version version_1 --sparsity $S \
    --ckpt $OUT/checkpoints/best
done

# --- 8. one-step OriginalNeRF rows ----------------------------------------
evaled eval_kitti_orig1 || \
step eval_kitti_orig1 timeout 7200 $P scripts/eval_scene.py --preset kitti00 \
  --method 1 --version version_0 --ckpt $KIT_OR/checkpoints/best
evaled eval_mai_orig1 || \
step eval_mai_orig1 timeout 5400 $P scripts/eval_scene.py --preset maicity00 \
  --method 1 --version version_0 \
  --ckpt logs/maicity00/maicity_00_1/originalnerf/checkpoints/best

# --- 9. multi-block: KITTI as two 25-frame blocks, one command ------------
grep -q "epoch 0 val" logs_bg/multiblock_r3.log 2>/dev/null || \
step multiblock_r3 timeout 7200 $P -m pcnerf_tpu.tools.multi_block \
  --dataset kitti --root $R/kitti/00/pcd_remove_dynamic \
  --poses $R/kitti/00/poses.txt --out artifacts/kitti00_blocks \
  --start 1150 --end 1200 --block-frames 25 --dtype bfloat16

# --- 10. stretch ----------------------------------------------------------
C40=logs/maicity00/maicity_00_1/pcnerf_c40
trained $C40 || \
step train_mai_c40 timeout 3600 $P -m pcnerf_tpu.train.run \
  --preset maicity00_pcnerf --dtype bfloat16 --skip-sanity-val \
  --art-dir artifacts/maicity00/maicity_00_1_c40 --out $C40
evaled eval_mai_c40 || \
step eval_mai_c40 timeout 5400 $P scripts/eval_scene.py --preset maicity00 \
  --method 2 --version version_1 --art-dir artifacts/maicity00/maicity_00_1_c40 \
  --ckpt $C40/checkpoints/best

MAI_DS=logs/maicity00/maicity_00_1/pcnerf_dense
trained $MAI_DS || \
step train_mai_dense timeout 3600 $P -m pcnerf_tpu.train.run \
  --preset maicity00_pcnerf --dtype bfloat16 --skip-sanity-val \
  --n-samples 1024 --n-importance 2048 --out $MAI_DS
evaled eval_mai_dense || \
step eval_mai_dense timeout 5400 $P scripts/eval_scene.py --preset maicity00 \
  --method 2 --version version_1 --ckpt $MAI_DS/checkpoints/best \
  --result-dir artifacts/maicity00/maicity_00_1/render_result_dense

KIT_OR3=logs/kitti00/1151_1200_view/originalnerf_e3
trained $KIT_OR3 || \
step train_kitti_orig_e3_r3f timeout 9000 $P -m pcnerf_tpu.train.run \
  --preset kitti00_originalnerf --dtype bfloat16 --skip-sanity-val --epochs 3 \
  --out $KIT_OR3 --resume
evaled eval_kitti_orig2_e3_r3f || \
step eval_kitti_orig2_e3_r3f timeout 7200 $P scripts/eval_scene.py \
  --preset kitti00 --method 2 --version version_0 --ckpt $KIT_OR3/checkpoints/best

grep -q '"batch": 4096' logs_bg/bench_curve_r3.log 2>/dev/null || \
for B in 256 512 1024 2048 4096; do
  step bench_curve_r3 timeout 1800 env BENCH_BATCH=$B $P bench.py
done

echo "=== r3 final queue done $(date -u +%H:%M:%S)" >> logs_bg/queue.log
