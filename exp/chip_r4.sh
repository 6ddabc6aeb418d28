#!/bin/bash
# Round-4 chip campaign: measure → unblock north star (VERDICT r3 #1/#2).
# Each stage is its own python process so a TPU-worker crash (the >=128-world
# "kernel fault") doesn't kill the campaign; the tunnel recovers between runs.
# Usage: bash exp/chip_r4.sh [stage ...]
# Stages: bench profile64 ns64 ns96 ns128 ns256 ns512 ns1024
# Default: bench profile64 ns64 ns128 ns256 ns512
# Output: appends to exp/chip_r4.log with timestamps.
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

for stage in "${@:-bench profile64 ns64 ns128 ns256 ns512}"; do
  for s in $stage; do
    case "$s" in
      bench)     run python -u bench.py ;;
      profile64) run env S2_PROF_WORLDS=64 S2_PROF_NARROW=lanes S2_PROF_COLORS=12 \
                   python -u exp/profile_stages.py full broad narrow colorinc solve ;;
      ns64)      run env S2_FS_WORLDS=64  S2_FS_NARROW=lanes python -u exp/flagship.py northstar ;;
      ns96)      run env S2_FS_WORLDS=96  S2_FS_NARROW=lanes python -u exp/flagship.py northstar ;;
      ns128)     run env S2_FS_WORLDS=128 S2_FS_NARROW=lanes python -u exp/flagship.py northstar ;;
      ns256)     run env S2_FS_WORLDS=256 S2_FS_NARROW=lanes python -u exp/flagship.py northstar ;;
      ns512)     run env S2_FS_WORLDS=512 S2_FS_NARROW=lanes python -u exp/flagship.py northstar ;;
      ns1024)    run env S2_FS_WORLDS=1024 S2_FS_NARROW=lanes python -u exp/flagship.py northstar ;;
      *) echo "unknown stage $s" >> "$LOG" ;;
    esac
  done
done
echo "=== [$(date +%H:%M:%S)] campaign done ===" >> "$LOG"
