#!/bin/bash
# Round-4 chip campaign, part D: crash ladder midpoint + bucketed solve.
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
run env S2_FS_WORLDS=256 S2_FS_CHUNK=64 S2_FS_NARROW=lanes python -u exp/flagship.py northstar
run env S2_BENCH_WORLDS=128 S2_BENCH_BUCKET=-1 python -u bench.py
run env S2_FS_WORLDS=64 S2_FS_BUCKET=-1 S2_FS_NARROW=lanes python -u exp/flagship.py northstar
echo "=== [$(date +%H:%M:%S)] campaign D done ===" >> "$LOG"
