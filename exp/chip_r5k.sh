#!/bin/bash
# Round-5 chip campaign K: single-world latency (VERDICT r4 weak #5).
# pyramid100 record: 26.7 ms/step (colors 12, dense, round 3). Two levers
# never tried on this scene: the color-bucketed solve (+20-22% at other
# scales) and the empty-joint-phase skip (the scene has zero joints).
# C = 20224; bucket cap at colors 12 uniform share = 1686.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
LOG=exp/chip_r5.log
run() {
  echo "=== [$(date +%H:%M:%S)] $* ===" >> "$LOG"
  timeout 7200 "$@" >> "$LOG" 2>&1
  echo "=== [$(date +%H:%M:%S)] rc=$? ===" >> "$LOG"
}
# (a) bucket + nojoints at colors 12 (cap 1.13x share, the ns-winning ratio)
run env S2_FS_NARROW=lanes S2_FS_NOJOINTS=1 S2_FS_BUCKET=1920 S2_FS_COLORS=12 \
    python -u exp/flagship.py pyramid100
# (b) colors 10 (uniform share 2023; cap 2176 = 1.08x): fewer phases if the
# capacity-aware coloring fits this graph at 10 — watch ovf
run env S2_FS_NARROW=lanes S2_FS_NOJOINTS=1 S2_FS_BUCKET=2176 S2_FS_COLORS=10 \
    python -u exp/flagship.py pyramid100
echo "=== [$(date +%H:%M:%S)] campaign K done ===" >> "$LOG"
# (c) appended after (b) won (14.7 ms, ovf 0): colors 9, cap 2432 = 1.08x share
