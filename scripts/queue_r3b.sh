#!/bin/bash
# Follow-on queue: waits for queue_r3.sh to finish, then runs the
# round-3 experiment + analysis pass (scripts/r3_experiments.sh — kept in
# a child script so it stays editable while this waiter runs).
cd /root/repo
log(){ echo "[$(date +%H:%M:%S)] $*"; }
while [ ! -e /tmp/queue_r3.done ] && \
      ! grep -q "queue_r3 done" /tmp/queue_r3.log 2>/dev/null; do
  sleep 120
done
log "queue_r3 finished; running experiments"
bash scripts/r3_experiments.sh
log "=== queue_r3b done ==="
