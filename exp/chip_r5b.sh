#!/bin/bash
# Round-5 chip campaign B: lane-batched solve measurements at north-star
# scale. Dense baselines (campaign A / round 4): ns64 111.6 wsps, ns96
# 104.2, ns112 105.4, ns512 hostchunk64 114.0 (official bench).
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
# 1) lane at the proven 64-world scale (direct vs 111.6 dense)
run env S2_FS_WORLDS=64 S2_FS_NARROW=lanes S2_FS_NOJOINTS=1 S2_FS_LANE=1 \
    python -u exp/flagship.py northstar
# 2) lane monolithic at 256 worlds: per-phase row count no longer scales
#    with W, and the program shape is new — both the scaling claim and the
#    (112,128] crash boundary get tested in one run
run env S2_FS_WORLDS=256 S2_FS_NARROW=lanes S2_FS_NOJOINTS=1 S2_FS_LANE=1 \
    python -u exp/flagship.py northstar
# 3) official-bench shape: 512 worlds hostchunked at 64 with the lane solve
run env S2_FS_WORLDS=512 S2_FS_HOSTCHUNK=64 S2_FS_NARROW=lanes S2_FS_NOJOINTS=1 S2_FS_LANE=1 \
    python -u exp/flagship.py northstar
echo "=== [$(date +%H:%M:%S)] campaign B done ===" >> "$LOG"
