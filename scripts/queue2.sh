#!/bin/bash
# Second study queue: waits for the first queue (spread + validation twins)
# to finish, then runs the SDDMM study and the medium study sequentially.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
while ! grep -q "validation twins done" /tmp/queue_r2.log 2>/dev/null; do
  sleep 120
done
echo "=== sddmm study ==="
for i in $(seq 1 6); do
  python scripts/run_sddmm_study.py && break
  [ "$?" != 2 ] && break
done
echo "=== medium study ==="
for i in $(seq 1 40); do
  python scripts/run_medium_study.py && break
  [ "$?" != 2 ] && break
done
echo "=== queue2 done ==="
