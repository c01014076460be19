#!/bin/bash
# Run a TPU script with retries around axon relay outages.
# Usage: scripts/tpu_retry.sh <max_attempts> <per_attempt_timeout_s> <cmd...>
set -u
attempts=$1; shift
per=$1; shift
for i in $(seq 1 "$attempts"); do
  echo "=== attempt $i/$attempts $(date +%H:%M:%S)"
  if timeout 90 python -c "import jax; jax.numpy.arange(4.).sum().block_until_ready()" 2>/dev/null; then
    timeout "$per" "$@" && exit 0
    echo "--- attempt $i ran but failed/timed out"
  else
    echo "--- relay down"
  fi
  sleep 120
done
echo "=== all attempts exhausted"
exit 1
