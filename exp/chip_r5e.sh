#!/bin/bash
# Round-5 chip campaign E: (1) finer stage split — structure build vs
# sweeps, match_contacts, aabb update (the 74 ms residual); (2) lane ns64
# with tighter bucket caps / fewer colors: T = max_colors*cap rows drive
# the warm-start scatter + phase gathers, and the auto cap (2x uniform
# share) makes half of them pads.
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
    python -u exp/profile_stages.py lanebuild match aabbs
run env S2_FS_WORLDS=64 S2_FS_NARROW=lanes S2_FS_NOJOINTS=1 S2_FS_LANE=1 \
    S2_FS_BUCKET=768 \
    python -u exp/flagship.py northstar
run env S2_FS_WORLDS=64 S2_FS_NARROW=lanes S2_FS_NOJOINTS=1 S2_FS_LANE=1 \
    S2_FS_COLORS=10 \
    python -u exp/flagship.py northstar
echo "=== [$(date +%H:%M:%S)] campaign E done ===" >> "$LOG"
