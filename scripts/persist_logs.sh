#!/bin/bash
# Mirror the durable parts of logs/ into the TRACKED saved_logs/ directory
# every 60 s.  logs/ and artifacts/ are gitignored and the machine is
# re-provisioned between sessions, which has already cost two sessions their
# trained checkpoints; with this mirror the end-of-round snapshot commit
# preserves everything needed to re-run evals without retraining.
#
# Mirrored: checkpoints/best (the eval input), metrics.jsonl, loss-curve
# npys, render_result outputs.  Skipped: 'last'/tmp checkpoints (mid-training
# state, ~27 MB each), tfevents (duplicate of metrics.jsonl), test-ray
# caches (rebuild in minutes), artifacts/ (GB-scale, rebuilds from
# /root/reference/data in ~2 min).
cd /root/repo
mkdir -p saved_logs
[ -f saved_logs/.stamp ] || touch -t 197001010000 saved_logs/.stamp
while true; do
  if [ -d logs ]; then
    touch saved_logs/.stamp.next
    find logs -type f \
        ! -path "*/checkpoints/last*" \
        ! -name "events.out.tfevents.*" \
        ! -path "*childnerf_ray_intersect*" \
        -newer saved_logs/.stamp -print0 \
      | while IFS= read -r -d '' f; do
          mkdir -p "saved_logs/$(dirname "${f#logs/}")"
          cp -p "$f" "saved_logs/${f#logs/}"
        done
    mv saved_logs/.stamp.next saved_logs/.stamp
  fi
  sleep 60
done
