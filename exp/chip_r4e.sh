#!/bin/bash
# Round-4 chip campaign, part E: host-chunked north star (the lax.map chunked
# program still crashes the worker at >=256 worlds — total-buffer triggered).
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
run env S2_FS_WORLDS=512 S2_FS_HOSTCHUNK=64 S2_FS_NARROW=lanes python -u exp/flagship.py northstar
run env S2_FS_WORLDS=1024 S2_FS_HOSTCHUNK=64 S2_FS_NARROW=lanes python -u exp/flagship.py northstar
echo "=== [$(date +%H:%M:%S)] campaign E done ===" >> "$LOG"
