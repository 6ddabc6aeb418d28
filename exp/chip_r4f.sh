#!/bin/bash
# Round-4 chip campaign, part F: the official BENCH_r04 configuration —
# north-star shape (base-62 pyramid, ~2k bodies) at 512 worlds via host
# chunking with the bucketed solve. Running it here warms /tmp/jaxcache with
# the exact program the driver's end-of-round bench.py will execute.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
LOG=exp/chip_r4.log
run() {
  echo "=== [$(date +%H:%M:%S)] $* ===" >> "$LOG"
  timeout 4200 "$@" >> "$LOG" 2>&1
  echo "=== [$(date +%H:%M:%S)] rc=$? ===" >> "$LOG"
}
run python -u bench.py
echo "=== [$(date +%H:%M:%S)] campaign F done ===" >> "$LOG"
