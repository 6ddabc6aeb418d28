#!/bin/bash
# Round-4 chip campaign, part B: chunked north-star (lax.map over 64-world
# sub-batches — the >=128-world monolithic program kills the TPU worker).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
LOG=exp/chip_r4.log
run() {
  echo "=== [$(date +%H:%M:%S)] $* ===" >> "$LOG"
  timeout 3600 "$@" >> "$LOG" 2>&1
  echo "=== [$(date +%H:%M:%S)] rc=$? ===" >> "$LOG"
}
run env S2_FS_WORLDS=128 S2_FS_CHUNK=64 S2_FS_NARROW=lanes python -u exp/flagship.py northstar
run env S2_FS_WORLDS=512 S2_FS_CHUNK=64 S2_FS_NARROW=lanes python -u exp/flagship.py northstar
echo "=== [$(date +%H:%M:%S)] campaign B done ===" >> "$LOG"
