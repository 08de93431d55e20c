#!/bin/bash
# Mirror logs/ (checkpoints, metrics, eval outputs) into the TRACKED
# saved_logs/ directory every 60 s.  logs/ and artifacts/ are gitignored and
# the machine is re-provisioned between sessions, which has already cost two
# sessions their trained checkpoints; with this mirror the end-of-round
# snapshot commit preserves everything needed to re-run evals without
# retraining.  artifacts/ is NOT mirrored: it is ~GB-scale and rebuilds from
# /root/reference/data in ~2 min.
cd /root/repo
while true; do
  if [ -d logs ]; then
    # cp -u: only newer files; orbax checkpoint dirs are write-once so this
    # is safe against torn copies except for in-flight writes, which the
    # next pass picks up complete.
    cp -ru logs/. saved_logs/ 2>/dev/null
  fi
  sleep 60
done
