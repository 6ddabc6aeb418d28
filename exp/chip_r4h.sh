#!/bin/bash
# Round-4 chip campaign, part H: solve_joints=False probe. A joint-free scene
# still pays joint_max_colors(=8) serialized phases per sweep on an empty
# 8-slot joint table — each with a full [B]-row gather_apply. Skipping them
# statically (config.solve_joints) is exact (bit-identical trajectories,
# tests/test_bucketed.py). Measure at ns64 bucketed; if it wins, flip the
# bench default and rewarm the cache with the final program (part I).
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
echo "=== [$(date +%H:%M:%S)] campaign H done ===" >> "$LOG"
