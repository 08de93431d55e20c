#!/bin/bash
# Round-5 queue — priorities from VERDICT.md (round 4) "Next round: do this":
#   1. sparsity program to the reference's claimed 90% edge: KITTI 75/80/90
#      and MaiCity 90, STEP-MATCHED budgets (the round-4 s80 finding:
#      epoch-denominated protocols under-train small train sets).  Matched
#      targets are the 20%-row DONE step counts: KITTI 15,759 / MaiCity
#      19,089.  Constant lr (--lr-milestones with no values): the 1-epoch
#      baseline never reaches the epoch-5 decay milestone, so matched-step
#      runs must not either.  One labeled epoch-matched probe (s90 e1).
#   6. one-step column: lambda_child_free Pareto sweep (3e6, 3e7 join the
#      measured 1e6 baseline and 1e7 point), BOTH eval columns per point;
#      MaiCity OriginalNeRF one-step probe (opacity regularizer).
#   7. MaiCity PC-NeRF Acc@0.2: one more geometry point (0.42 m child grid
#      between the measured 0.40/0.45).
#   4. batch curve 256/512/1024/2048/4096 (third ask; persistent cache).
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
  echo "=== [$name] start $(date -u +%H:%M:%S)" >> logs_bg/queue_r5.log
  "$@" >> "logs_bg/${name}.log" 2>&1
  local rc=$?
  echo "=== [$name] rc=$rc dt=$((SECONDS-t0))s" >> logs_bg/queue_r5.log
  return $rc
}
have() { [ -e "$1" ]; }
trained() { [ -e "$1/DONE" ]; }
evaled() { grep -q '"cd"' "logs_bg/$1.log" 2>/dev/null; }

# --- 0. persist mirror + checkpoint restore ------------------------------
if ! pgrep -f scripts/persist_logs.sh >/dev/null 2>&1; then
  nohup bash scripts/persist_logs.sh > logs_bg/persist.out 2>&1 &
  disown
fi
cp -prn saved_logs/maicity00 logs/ 2>/dev/null || true
mkdir -p logs/kitti00
cp -prn saved_logs/kitti00/1151_1200_view logs/kitti00/ 2>/dev/null || true

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
wait
prep_kitti _s75   75 &
prep_kitti _s80   80 &
prep_mai _s90     90 &
prep_mai _c42     20 --cell 0.42 &
wait
prep_kitti _s90   90 &
wait

# --- 2. bench first: validates + warms the round-5 step HLO ---------------
step bench_r5 timeout 3600 $P bench.py

KV=logs/kitti00/1151_1200_view
MAI=logs/maicity00/maicity_00_1
KSTEPS=15759   # logs/kitti00/1151_1200_view/pcnerf/DONE (20% row)
MSTEPS=19089   # logs/maicity00/maicity_00_1/pcnerf/DONE (20% row)

# --- 3. sparsity to the 90% edge, step-matched (VERDICT #1) --------------
sparsity_cell() {  # <scene:kitti|mai> <S> <max_steps>
  local scene=$1 S=$2 ms=$3
  local preset=kitti00_pcnerf evp=kitti00 out=$KV/pcnerf_s$S
  if [ "$scene" = mai ]; then
    preset=maicity00_pcnerf; evp=maicity00; out=$MAI/pcnerf_s$S
  fi
  trained $out || \
  step train_${scene}_s${S}_r5 timeout 7200 $P -m pcnerf_tpu.train.run \
    --preset $preset --sparsity $S --dtype bfloat16 --skip-sanity-val \
    --epochs 99 --max-steps $ms --lr-milestones --resume
  evaled eval_${scene}_s${S}_r5 || \
  step eval_${scene}_s${S}_r5 timeout 14400 $P scripts/eval_scene.py \
    --preset $evp --method 2 --version version_1 --sparsity $S \
    --ckpt $out/checkpoints/best
}
sparsity_cell kitti 75 $KSTEPS
sparsity_cell kitti 80 $KSTEPS
sparsity_cell kitti 90 $KSTEPS
sparsity_cell mai   90 $MSTEPS

# epoch-matched probe at the edge (labeled row: 1 epoch = ~1.6k steps)
S90E1=$KV/pcnerf_s90_e1
trained $S90E1 || \
step train_kitti_s90_e1_r5 timeout 3600 $P -m pcnerf_tpu.train.run \
  --preset kitti00_pcnerf --sparsity 90 --dtype bfloat16 --skip-sanity-val \
  --out $S90E1 --resume
evaled eval_kitti_s90_e1_r5 || \
step eval_kitti_s90_e1_r5 timeout 14400 $P scripts/eval_scene.py \
  --preset kitti00 --method 2 --version version_1 --sparsity 90 \
  --ckpt $S90E1/checkpoints/best --result-dir $S90E1/render_result

# --- 4. one-step lambda_child_free Pareto sweep (VERDICT #6) -------------
lcf_point() {  # <tag> <lambda>
  local tag=$1 lam=$2
  local out=$KV/pcnerf_$tag
  trained $out || \
  step train_kitti_pc_${tag}_r5 timeout 5400 $P -m pcnerf_tpu.train.run \
    --preset kitti00_pcnerf --dtype bfloat16 --skip-sanity-val \
    --lambda-child-free $lam --out $out --resume
  evaled eval_kitti_pc1_${tag}_r5 || \
  step eval_kitti_pc1_${tag}_r5 timeout 5400 $P scripts/eval_scene.py \
    --preset kitti00 --method 1 --version version_1 \
    --ckpt $out/checkpoints/best --result-dir $out/render_result
  evaled eval_kitti_pc2_${tag}_r5 || \
  step eval_kitti_pc2_${tag}_r5 timeout 7200 $P scripts/eval_scene.py \
    --preset kitti00 --method 2 --version version_1 \
    --ckpt $out/checkpoints/best --result-dir $out/render_result
}
lcf_point lcf3e6 3e6
lcf_point lcf3e7 3e7

# --- 5. MaiCity OriginalNeRF one-step probe (VERDICT #6) -----------------
MO=$MAI/originalnerf_opac01
trained $MO || \
step train_mai_orig_opac01_r5 timeout 5400 $P -m pcnerf_tpu.train.run \
  --preset maicity00_originalnerf --dtype bfloat16 --skip-sanity-val \
  --lambda-opacity 0.1 --out $MO --resume
evaled eval_mai_orig1_opac01_r5 || \
step eval_mai_orig1_opac01_r5 timeout 5400 $P scripts/eval_scene.py \
  --preset maicity00 --method 1 --version version_0 \
  --ckpt $MO/checkpoints/best --result-dir $MO/render_result
evaled eval_mai_orig2_opac01_r5 || \
step eval_mai_orig2_opac01_r5 timeout 5400 $P scripts/eval_scene.py \
  --preset maicity00 --method 2 --version version_0 \
  --ckpt $MO/checkpoints/best --result-dir $MO/render_result

# --- 6. MaiCity PC-NeRF 0.42 m child grid (VERDICT #7) -------------------
MC42=$MAI/pcnerf_c42
trained $MC42 || \
step train_mai_c42_r5 timeout 5400 $P -m pcnerf_tpu.train.run \
  --preset maicity00_pcnerf --dtype bfloat16 --skip-sanity-val \
  --art-dir artifacts/maicity00/maicity_00_1_c42 --out $MC42 --resume
evaled eval_mai_c42_r5 || \
step eval_mai_c42_r5 timeout 7200 $P scripts/eval_scene.py \
  --preset maicity00 --method 2 --version version_1 \
  --art-dir artifacts/maicity00/maicity_00_1_c42 \
  --ckpt $MC42/checkpoints/best --result-dir $MC42/render_result

# --- 7. batch curve (VERDICT #4, third ask) ------------------------------
grep -q '"batch": 4096' logs_bg/bench_curve_r5.log 2>/dev/null || \
for B in 256 512 1024 2048 4096; do
  step bench_curve_r5 timeout 2400 env BENCH_BATCH=$B $P bench.py
done

echo "=== r5 queue done $(date -u +%H:%M:%S)" >> logs_bg/queue_r5.log
