#!/bin/bash
# Restart wrapper for tools/sweep.py: a dead TPU worker exits the sweep
# with status 3; this loop relaunches it (fresh JAX runtime) and the
# done-log resumes where it left off. Any other exit ends the loop.
cd "$(dirname "$0")/.."
for i in $(seq 1 20); do
  "$@"
  rc=$?
  if [ $rc -ne 3 ]; then exit $rc; fi
  echo "# sweep exited for worker restart (attempt $i); waiting 180s" >&2
  sleep 330
done
exit 1
