#!/bin/bash
# Round-4 chip campaign, part G: (1) stage profile at NORTH-STAR scale with
# the bucketed solve — round-3 profiles only exist at 64x211; the next lever
# must be picked from where the time actually goes at 64x1954. (2) a
# phase-count probe: colors=10 cuts the unrolled solve phases 12->10 (~17%)
# IF the base-62 pyramid's contact graph still colors without overflow
# (capacity-aware balancing; watch color_ovf — base-100 broke at 8, ran at 12).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
LOG=exp/chip_r4.log
run() {
  echo "=== [$(date +%H:%M:%S)] $* ===" >> "$LOG"
  timeout 7200 "$@" >> "$LOG" 2>&1
  echo "=== [$(date +%H:%M:%S)] rc=$? ===" >> "$LOG"
}
run env S2_PROF_WORLDS=64 S2_PROF_BASE=62 S2_PROF_BUCKET=-1 S2_PROF_NARROW=lanes \
    python -u exp/profile_stages.py full solve broad narrow color
run env S2_FS_WORLDS=64 S2_FS_COLORS=10 S2_FS_BUCKET=-1 S2_FS_NARROW=lanes \
    python -u exp/flagship.py northstar
echo "=== [$(date +%H:%M:%S)] campaign G done ===" >> "$LOG"
