#!/bin/bash
# Round-4 chip campaign, part H:
# 1) solve_joints=False probe at ns64 bucketed — a joint-free scene still
#    pays 8 joint colors of serialized phases per sweep on an empty 8-slot
#    table (each with a [B]-row gather_apply). Skipping statically is exact
#    (bit-identical, tests/test_bucketed.py).
# 2) chunk-size ladder 96/112 (bucketed, nojoints): the crash ladder only
#    established >=128 monolithic kills the worker; 96/112 were never tried.
#    If solve phases are latency-bound at 64 worlds, larger chunks amortize
#    the per-phase fixed cost -> higher wsps per chunk, and the official
#    bench can host-chunk at the larger size.
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
run env S2_FS_WORLDS=64 S2_FS_BUCKET=-1 S2_FS_NARROW=lanes S2_FS_NOJOINTS=1 \
    python -u exp/flagship.py northstar
run env S2_FS_WORLDS=96 S2_FS_BUCKET=-1 S2_FS_NARROW=lanes S2_FS_NOJOINTS=1 \
    python -u exp/flagship.py northstar
run env S2_FS_WORLDS=112 S2_FS_BUCKET=-1 S2_FS_NARROW=lanes S2_FS_NOJOINTS=1 \
    python -u exp/flagship.py northstar
echo "=== [$(date +%H:%M:%S)] campaign H done ===" >> "$LOG"
