#!/bin/bash
# Waits for the spread-sample sweep to finish, then runs the queued TPU
# studies sequentially (one TPU process at a time avoids device-memory
# poisoning between concurrent benchmarks).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
while pgrep -f "medium_spread_r2" > /dev/null 2>&1; do sleep 60; done
echo "=== spread done; starting validation twins ==="
for i in $(seq 1 10); do
  python scripts/run_validation_twins.py && break
  [ "$?" != 2 ] && break
  echo "restart $i after device error" >&2
done
echo "=== validation twins done ==="
