#!/bin/bash
# Round-3 measurement queue: close every "queued" RESULTS.md cell.
#
# Guard rules (fixes ADVICE r2 high/medium):
#   * trainings are skipped ONLY on the <out_dir>/DONE sentinel that
#     train/loop.py writes after the final checkpoint flush — a restored
#     mid-training best checkpoint no longer masquerades as a finished run;
#   * preprocessing is skipped ONLY on preprocess_meta.json, the LAST file
#     the pipeline writes;
#   * evals are skipped on a '"cd"' line in their own round-3 log.
# Every TPU job runs under `timeout` so a wedged tunnel can't eat the round.
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
trained() { [ -e "$1/DONE" ]; }
evaled() { grep -q '"cd"' "logs_bg/$1.log" 2>/dev/null; }

# --- preps (CPU; 80%-sparsity is new this round) -------------------------
have artifacts/maicity00/maicity_00_1_s80/preprocess_meta.json || \
step prep_mai_s80 $P -m pcnerf_tpu.preprocess.pipeline --dataset maicity \
  --root $R/maicity/00/pcd --poses $R/maicity/00/poses.txt \
  --out artifacts/maicity00/maicity_00_1_s80 --start 0 --end 50 \
  --sparsity 80 --crop -12 -12 -2 61 12 0.5 &
PREP_S80=$!

# ==========================================================================
# 1. MaiCity PC-NeRF: retrain (ckpt lost to re-provisioning), then the
#    one-step ablation row + the two-step cell re-measure.
# ==========================================================================
MAI_PC=logs/maicity00/maicity_00_1/pcnerf
trained $MAI_PC || \
step train_mai_pc_r3 timeout 3600 $P -m pcnerf_tpu.train.run \
  --preset maicity00_pcnerf --dtype bfloat16 --skip-sanity-val --resume
evaled eval_mai_pc1_r3 || \
step eval_mai_pc1_r3 timeout 5400 $P scripts/eval_scene.py --preset maicity00 \
  --method 1 --version version_1 --ckpt $MAI_PC/checkpoints/best
evaled eval_mai_pc2_r3 || \
step eval_mai_pc2_r3 timeout 5400 $P scripts/eval_scene.py --preset maicity00 \
  --method 2 --version version_1 --ckpt $MAI_PC/checkpoints/best

# ==========================================================================
# 2. MaiCity 50% sparsity row (train died at step 1449/11887 in round 2;
#    the restored best/ is mid-training — DONE guard forces the retrain)
# ==========================================================================
MAI_S50=logs/maicity00/maicity_00_1/pcnerf_s50
trained $MAI_S50 || \
step train_mai_s50_r3 timeout 3600 $P -m pcnerf_tpu.train.run \
  --preset maicity00_pcnerf --sparsity 50 --dtype bfloat16 --skip-sanity-val \
  --resume
evaled eval_mai_s50_r3 || \
step eval_mai_s50_r3 timeout 5400 $P scripts/eval_scene.py --preset maicity00 \
  --method 2 --version version_1 --sparsity 50 --ckpt $MAI_S50/checkpoints/best

# ==========================================================================
# 3. KITTI PC-NeRF: retrain (ckpt lost), one-step ablation row
#    (reference ships version_1_*_one_step.pcd: CD 1.6204 / F 0.1782).
#    The eval also rebuilds the one_step test-ray trees.
# ==========================================================================
KIT_PC=logs/kitti00/1151_1200_view/pcnerf
trained $KIT_PC || \
step train_kitti_pc_r3 timeout 5400 $P -m pcnerf_tpu.train.run \
  --preset kitti00_pcnerf --dtype bfloat16 --skip-sanity-val --resume
evaled eval_kitti_pc1_r3 || \
step eval_kitti_pc1_r3 timeout 7200 $P scripts/eval_scene.py --preset kitti00 \
  --method 1 --version version_1 --ckpt $KIT_PC/checkpoints/best
# two-step re-measure with this checkpoint (also regenerates the two_step
# test-ray trees the golden fingerprint tests fixture on)
evaled eval_kitti_pc2_r3 || \
step eval_kitti_pc2_r3 timeout 7200 $P scripts/eval_scene.py --preset kitti00 \
  --method 2 --version version_1 --ckpt $KIT_PC/checkpoints/best

# ==========================================================================
# 4. KITTI OriginalNeRF cell: 1-epoch (reference protocol) then 3-epoch.
# ==========================================================================
KIT_OR=logs/kitti00/1151_1200_view/originalnerf
trained $KIT_OR || \
step train_kitti_orig_r3 timeout 5400 $P -m pcnerf_tpu.train.run \
  --preset kitti00_originalnerf --dtype bfloat16 --skip-sanity-val --resume
evaled eval_kitti_orig2_r3 || \
step eval_kitti_orig2_r3 timeout 7200 $P scripts/eval_scene.py --preset kitti00 \
  --method 2 --version version_0 --ckpt $KIT_OR/checkpoints/best

KIT_OR3=logs/kitti00/1151_1200_view/originalnerf_e3
trained $KIT_OR3 || \
step train_kitti_orig_e3_r3 timeout 9000 $P -m pcnerf_tpu.train.run \
  --preset kitti00_originalnerf --dtype bfloat16 --skip-sanity-val --epochs 3 \
  --out $KIT_OR3 --resume
evaled eval_kitti_orig2_e3_r3 || \
step eval_kitti_orig2_e3_r3 timeout 7200 $P scripts/eval_scene.py --preset kitti00 \
  --method 2 --version version_0 --ckpt $KIT_OR3/checkpoints/best

# ==========================================================================
# 5. MaiCity 80% sparsity row (second sparsity point)
# ==========================================================================
wait $PREP_S80
MAI_S80=logs/maicity00/maicity_00_1/pcnerf_s80
trained $MAI_S80 || \
step train_mai_s80_r3 timeout 3600 $P -m pcnerf_tpu.train.run \
  --preset maicity00_pcnerf --sparsity 80 --dtype bfloat16 --skip-sanity-val
evaled eval_mai_s80_r3 || \
step eval_mai_s80_r3 timeout 5400 $P scripts/eval_scene.py --preset maicity00 \
  --method 2 --version version_1 --sparsity 80 --ckpt $MAI_S80/checkpoints/best

# ==========================================================================
# 6. Perf: the component profile PERF.md has been owing, then the bench.
# ==========================================================================
grep -q "component" logs_bg/profile_r3.log 2>/dev/null || \
step profile_r3 timeout 7200 $P scripts/profile_step.py
step bench_r3 timeout 3600 $P bench.py

echo "=== r3 queue done $(date -u +%H:%M:%S)" >> logs_bg/queue.log
