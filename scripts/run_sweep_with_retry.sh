#!/bin/bash
# Retry wrapper for run_reference_sweep.py: a failed compile/alloc can
# poison the process's device memory, so the sweep exits(2) on device
# errors and this loop restarts it with resume (reference run.sh:357-394
# retry-on-error discipline).
for i in $(seq 1 "${MAX_RESTARTS:-20}"); do
  python "$(dirname "$0")/run_reference_sweep.py" && exit 0
  code=$?
  [ "$code" != 2 ] && exit "$code"
  echo "restart $i after device error" >&2
done
exit 1
