#!/bin/bash
# Mirror the durable parts of logs/ into the TRACKED saved_logs/ directory
# every 60 s.  logs/ and artifacts/ are gitignored and the machine is
# re-provisioned between sessions; with this mirror the end-of-round
# snapshot commit preserves everything needed to re-run evals without
# retraining.
#
# Mirrored: checkpoints/best + best.json (the eval input), metrics.jsonl,
# loss-curve npys, render_result outputs.  Skipped: 'last'/tmp checkpoints,
# tfevents, test-ray caches, artifacts/ (rebuild from /root/reference/data).
#
# Checkpoints are mirrored AS A UNIT, not file-by-file: an orbax OCDBT dir
# copied while a save is in flight yields truncated zstd streams (this
# corrupted the round-2 pcnerf_s50 mirror).  Consistency protocol: best.json
# is written only AFTER save(best) completes (utils/ckpt.py BestLastTracker),
# so best/ is a consistent snapshot iff no file under best/ is newer than
# best.json, checked both before and after the copy; the mirror is then
# replaced atomically (tmp + rename), never accumulated incrementally.
cd /root/repo
mkdir -p saved_logs
[ -f saved_logs/.stamp ] || touch -t 197001010000 saved_logs/.stamp

mirror_ckpt() {  # $1 = a logs/**/checkpoints dir
  local src=$1 rel=${1#logs/} dst tmp t1 t2
  local bj=$src/best.json
  [ -f "$bj" ] && [ -d "$src/best" ] || return 0
  dst=saved_logs/$rel
  [ -f "$dst/best.json" ] && [ ! "$bj" -nt "$dst/best.json" ] && return 0
  # a save in flight leaves best/ files newer than the sidecar: wait a tick
  [ -n "$(find "$src/best" -newer "$bj" -print -quit 2>/dev/null)" ] && return 0
  t1=$(stat -c %Y "$bj")
  tmp=$dst.tmp.$$
  rm -rf "$tmp" "$tmp.best.json"
  mkdir -p "$(dirname "$dst")"
  cp -rp "$src/best" "$tmp" 2>/dev/null || { rm -rf "$tmp"; return 0; }
  cp -p "$bj" "$tmp.best.json" 2>/dev/null || { rm -rf "$tmp"; return 0; }
  t2=$(stat -c %Y "$bj")
  if [ "$t1" = "$t2" ] && \
     [ -z "$(find "$src/best" -newer "$bj" -print -quit 2>/dev/null)" ]; then
    mkdir -p "$dst"
    rm -rf "$dst/best"
    mv "$tmp" "$dst/best" && mv "$tmp.best.json" "$dst/best.json"
  else
    rm -rf "$tmp" "$tmp.best.json"
  fi
}

while true; do
  if [ -d logs ]; then
    touch saved_logs/.stamp.next
    find logs -type f \
        ! -path "*/checkpoints/*" \
        ! -name "events.out.tfevents.*" \
        ! -path "*childnerf_ray_intersect*" \
        -newer saved_logs/.stamp -print0 \
      | while IFS= read -r -d '' f; do
          mkdir -p "saved_logs/$(dirname "${f#logs/}")"
          cp -p "$f" "saved_logs/${f#logs/}"
        done
    find logs -type d -name checkpoints 2>/dev/null | while read -r c; do
      mirror_ckpt "$c"
    done
    mv saved_logs/.stamp.next saved_logs/.stamp
  fi
  sleep 60
done
