#!/bin/bash
# Commit freshly-landed benchmark rows every 20 minutes while the study
# queues run.  Uses `git commit -- <paths>` so only result files are
# committed (never racing in-flight source work in the index).
cd /root/repo
while true; do
  sleep 1200
  if ! git diff --quiet -- benchmark_results || \
     [ -n "$(git ls-files --others --exclude-standard benchmark_results)" ]; then
    files=$(git status --porcelain -- benchmark_results | awk '{print $2}' \
            | xargs -n1 basename | sort -u | tr '\n' ' ')
    git add -- benchmark_results
    git commit -q -m "bench data: ${files}" -- benchmark_results && \
      echo "[$(date +%H:%M:%S)] committed: ${files}"
  fi
done
