#!/bin/bash
# Round-5 chip campaign C: (1) stage profile of the LANE step at north-star
# scale — where do the 275 ms/step at 64x1954 go now that the solve's
# row-gather cost is W-independent? (2) the crash_repro ladder (VERDICT r4
# #4): does total resident allocation alone kill the worker?
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
run env S2_PROF_WORLDS=64 S2_PROF_BASE=62 S2_PROF_BUCKET=-1 S2_PROF_NARROW=lanes \
    S2_PROF_NOJOINTS=1 \
    python -u exp/profile_stages.py lanefull lanesolve broad narrow
run python -u exp/crash_repro.py alloc 4
run python -u exp/crash_repro.py alloc 10
run python -u exp/crash_repro.py deadweight 8
echo "=== [$(date +%H:%M:%S)] campaign C done ===" >> "$LOG"
