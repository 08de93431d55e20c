#!/bin/bash
# Round-4 queue — priorities from VERDICT.md (round 3) "Next round: do this":
#   1a. KITTI OriginalNeRF: 3-epoch stretch row + seed spread (43, 44)
#   1b. KITTI PC-NeRF one-step: interventions on the background-occupancy
#       diagnosis (opacity regularizer / lambda_child_free x10 / 3 epochs)
#   2.  KITTI sparsity program: 33/50/67% end-to-end
#   3.  voxel-raycast classical baseline rows (both scenes, 3 voxel sizes)
#   4.  80%-sparsity collapse probes (3-epoch budget, 0.40 m grid, voxel
#       baseline floor at 80%)
#   5.  multi-block with rendered per-block metrics (new eval phase)
#   6.  sustained-throughput demonstration run (device-gather loop +
#       debounced checkpoints; target >= 20k rays/s in a real training log)
#   8.  batch-curve warm-cache points + pallas/bench re-measures
#
# Guards: trainings skip on <out>/DONE; preps skip on preprocess_meta.json;
# evals skip on a '"cd"' line in their own log.  All TPU jobs under timeout,
# strictly serialized (concurrent TPU jobs degrade each other's timings).
set -x
cd /root/repo
P=python
R=/root/reference/data
mkdir -p logs_bg logs artifacts

step() {
  local name=$1; shift
  local t0=$SECONDS
  echo "=== [$name] start $(date -u +%H:%M:%S)" >> logs_bg/queue_r4b.log
  "$@" >> "logs_bg/${name}.log" 2>&1
  local rc=$?
  echo "=== [$name] rc=$rc dt=$((SECONDS-t0))s" >> logs_bg/queue_r4b.log
  return $rc
}
have() { [ -e "$1" ]; }
trained() { [ -e "$1/DONE" ]; }
evaled() { grep -q '"cd"' "logs_bg/$1.log" 2>/dev/null; }

# --- 0. persist mirror + checkpoint restore ------------------------------
if ! pgrep -f scripts/persist_logs.sh >/dev/null 2>&1; then
  nohup bash scripts/persist_logs.sh > logs_bg/persist.out 2>&1 &
  disown  # keep the infinite mirror loop out of this script's `wait` set
fi
# restore checkpoints that survived re-provisioning (only with completion
# evidence: every saved_logs dir below carries DONE from its finished run,
# except originalnerf_e3 which was mid-training -> NOT trusted, retrained)
cp -prn saved_logs/maicity00 logs/ 2>/dev/null || true
mkdir -p logs/kitti00
cp -prn saved_logs/kitti00/1151_1200_view logs/kitti00/ 2>/dev/null || true
rm -rf logs/kitti00/1151_1200_view/originalnerf_e3   # no DONE: partial

# --- 1. preps (CPU, parallel) --------------------------------------------
prep_mai() {  # prep_mai <suffix> <sparsity> [extra args...]
  local suf=$1 sp=$2; shift 2
  local out=artifacts/maicity00/maicity_00_1$suf
  have $out/preprocess_meta.json || \
  step prep_mai$suf $P -m pcnerf_tpu.preprocess.pipeline --dataset maicity \
    --root $R/maicity/00/pcd --poses $R/maicity/00/poses.txt \
    --out $out --start 0 --end 50 --sparsity $sp "$@" \
    --crop -12 -12 -2 61 12 0.5
}
prep_kitti() {  # prep_kitti <suffix> <sparsity>
  local suf=$1 sp=$2
  local out=artifacts/kitti00/1151_1200_view$suf
  have $out/preprocess_meta.json || \
  step prep_kitti$suf $P -m pcnerf_tpu.preprocess.pipeline --dataset kitti \
    --root $R/kitti/00/pcd_remove_dynamic --poses $R/kitti/00/poses.txt \
    --out $out --start 1150 --end 1200 --sparsity $sp
}
prep_kitti ""     20 &
prep_mai ""       20 &
prep_mai _s80     80 &
wait
prep_kitti _s33   33 &
prep_kitti _s50   50 &
prep_mai _s67     67 &
prep_mai _s80c40  80 --cell 0.40 &
wait
prep_kitti _s67   67 &
wait

# --- 2. bench first: validates + warms the round-4 step HLO ---------------
step bench_r4 timeout 3600 $P bench.py

KV=logs/kitti00/1151_1200_view

# --- 3. KITTI OriginalNeRF: the 3-epoch stretch row (VERDICT #1a) --------
OR_E3=$KV/originalnerf_e3r4
trained $OR_E3 || \
step train_kitti_orig_e3_r4 timeout 9000 $P -m pcnerf_tpu.train.run \
  --preset kitti00_originalnerf --dtype bfloat16 --skip-sanity-val \
  --epochs 3 --out $OR_E3 --resume
evaled eval_kitti_orig2_e3_r4 || \
step eval_kitti_orig2_e3_r4 timeout 7200 $P scripts/eval_scene.py \
  --preset kitti00 --method 2 --version version_0 \
  --ckpt $OR_E3/checkpoints/best --result-dir $OR_E3/render_result

# --- 4. KITTI OriginalNeRF seed spread at matched budget (VERDICT #1a) ---
for SEED in 43 44; do
  OUT=$KV/originalnerf_seed$SEED
  trained $OUT || \
  step train_kitti_orig_s${SEED}_r4 timeout 5400 $P -m pcnerf_tpu.train.run \
    --preset kitti00_originalnerf --dtype bfloat16 --skip-sanity-val \
    --seed $SEED --out $OUT --resume
  evaled eval_kitti_orig2_seed${SEED}_r4 || \
  step eval_kitti_orig2_seed${SEED}_r4 timeout 7200 $P scripts/eval_scene.py \
    --preset kitti00 --method 2 --version version_0 \
    --ckpt $OUT/checkpoints/best --result-dir $OUT/render_result
done

# --- 5. KITTI PC-NeRF one-step interventions (VERDICT #1b) ---------------
# diagnosis: near-origin background occupancy integrated by parent-bound
# compositing.  Levers, one variant each at the matched protocol:
#   (a) opacity regularizer (binarizes occupancy; reference render.py:224)
#   (b) lambda_child_free x10 (suppresses free-space weight harder)
#   (c) 3-epoch budget
onestep_variant() {  # <tag> <timeout> <train extra args...>
  local tag=$1 to=$2; shift 2
  local out=$KV/pcnerf_$tag
  trained $out || \
  step train_kitti_pc_${tag}_r4 timeout $to $P -m pcnerf_tpu.train.run \
    --preset kitti00_pcnerf --dtype bfloat16 --skip-sanity-val \
    --out $out --resume "$@"
  evaled eval_kitti_pc1_${tag}_r4 || \
  step eval_kitti_pc1_${tag}_r4 timeout 5400 $P scripts/eval_scene.py \
    --preset kitti00 --method 1 --version version_1 \
    --ckpt $out/checkpoints/best --result-dir $out/render_result
  evaled eval_kitti_pc2_${tag}_r4 || \
  step eval_kitti_pc2_${tag}_r4 timeout 7200 $P scripts/eval_scene.py \
    --preset kitti00 --method 2 --version version_1 \
    --ckpt $out/checkpoints/best --result-dir $out/render_result
}
onestep_variant opac01 5400 --lambda-opacity 0.1
onestep_variant lcf1e7 5400 --lambda-child-free 1e7
onestep_variant e3     9000 --epochs 3

grep -q "pallas_ms" logs_bg/pallas_tpu_r4.log 2>/dev/null || \
step pallas_tpu_r4 timeout 3600 $P scripts/pallas_tpu_check.py

# --- 6. KITTI sparsity program 33/50/67 (VERDICT #2) ---------------------
for S in 33 50 67; do
  OUT=$KV/pcnerf_s$S
  trained $OUT || \
  step train_kitti_s${S}_r4 timeout 5400 $P -m pcnerf_tpu.train.run \
    --preset kitti00_pcnerf --sparsity $S --dtype bfloat16 --skip-sanity-val \
    --resume
  evaled eval_kitti_s${S}_r4 || \
  step eval_kitti_s${S}_r4 timeout 10800 $P scripts/eval_scene.py \
    --preset kitti00 --method 2 --version version_1 --sparsity $S \
    --ckpt $OUT/checkpoints/best
done

# --- 7. voxel-raycast classical baseline rows (VERDICT #3 + #4 floor) ----
grep -q '"voxel": 0.25' logs_bg/voxbase_kitti_r4.log 2>/dev/null || \
step voxbase_kitti_r4 timeout 10800 $P scripts/voxel_baseline.py \
  --preset kitti00 --voxels 0.75 0.5 0.25
grep -q '"voxel": 0.25' logs_bg/voxbase_mai_r4.log 2>/dev/null || \
step voxbase_mai_r4 timeout 10800 $P scripts/voxel_baseline.py \
  --preset maicity00 --voxels 0.75 0.5 0.25
grep -q '"voxel": 0.5' logs_bg/voxbase_mai_s80_r4.log 2>/dev/null || \
step voxbase_mai_s80_r4 timeout 7200 $P scripts/voxel_baseline.py \
  --preset maicity00 --sparsity 80 --voxels 0.5
grep -q '"voxel": 0.5' logs_bg/voxbase_mai_s67_r4.log 2>/dev/null || \
step voxbase_mai_s67_r4 timeout 7200 $P scripts/voxel_baseline.py \
  --preset maicity00 --sparsity 67 --voxels 0.5

# --- 8. 80%-sparsity collapse probes (VERDICT #4) ------------------------
MAI=logs/maicity00/maicity_00_1
S80E3=$MAI/pcnerf_s80_e3
trained $S80E3 || \
step train_mai_s80_e3_r4 timeout 5400 $P -m pcnerf_tpu.train.run \
  --preset maicity00_pcnerf --sparsity 80 --dtype bfloat16 --skip-sanity-val \
  --epochs 3 --out $S80E3 --resume
evaled eval_mai_s80_e3_r4 || \
step eval_mai_s80_e3_r4 timeout 10800 $P scripts/eval_scene.py \
  --preset maicity00 --method 2 --version version_1 --sparsity 80 \
  --ckpt $S80E3/checkpoints/best --result-dir $S80E3/render_result
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

# --- 9. multi-block with rendered per-block metrics (VERDICT #5) ---------
grep -q "block .* metrics" logs_bg/multiblock_r4.log 2>/dev/null || \
step multiblock_r4 timeout 14400 $P -m pcnerf_tpu.tools.multi_block \
  --dataset kitti --root $R/kitti/00/pcd_remove_dynamic \
  --poses $R/kitti/00/poses.txt --out artifacts/kitti00_blocks \
  --start 1150 --end 1200 --block-frames 25 --dtype bfloat16

# --- 10. sustained-throughput run (VERDICT #6) ---------------------------
TPUT=$MAI/pcnerf_b1024_r4
trained $TPUT || \
step train_mai_tput_r4 timeout 3600 $P -m pcnerf_tpu.train.run \
  --preset maicity00_pcnerf --dtype bfloat16 --skip-sanity-val \
  --batch-size 1024 --out $TPUT

# --- 11. perf re-measures: pallas on TPU + batch-curve warm points -------
grep -q '"batch": 4096' logs_bg/bench_curve_r4.log 2>/dev/null || \
for B in 256 512 1024 2048 4096; do
  step bench_curve_r4 timeout 2400 env BENCH_BATCH=$B $P bench.py
done

echo "=== r4 queue done $(date -u +%H:%M:%S)" >> logs_bg/queue_r4b.log
