#!/bin/bash
# Round-5 chip campaign F: combine the campaign-E winners (colors=10, tight
# bucket cap) on the lane path, then scale. Cap note: colors=10 needs cap >=
# 7936/10 = 794 for full capacity; 896 gives 1.13x headroom (watch ovf).
# Baselines: ns64 lane c12 cap1328 = 232.8; c12 cap768 = 299.5 (pre-lane-pre);
# c10 cap-auto + lane-pre = 525.7.
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
run env S2_FS_WORLDS=64 S2_FS_NARROW=lanes S2_FS_NOJOINTS=1 S2_FS_LANE=1 \
    S2_FS_COLORS=10 S2_FS_BUCKET=896 \
    python -u exp/flagship.py northstar
run env S2_FS_WORLDS=256 S2_FS_NARROW=lanes S2_FS_NOJOINTS=1 S2_FS_LANE=1 \
    S2_FS_COLORS=10 S2_FS_BUCKET=896 \
    python -u exp/flagship.py northstar
run env S2_FS_WORLDS=512 S2_FS_HOSTCHUNK=64 S2_FS_NARROW=lanes S2_FS_NOJOINTS=1 \
    S2_FS_LANE=1 S2_FS_COLORS=10 S2_FS_BUCKET=896 \
    python -u exp/flagship.py northstar
# monolithic 512 LAST: if the worker dies, nothing queued behind it is lost
run env S2_FS_WORLDS=512 S2_FS_NARROW=lanes S2_FS_NOJOINTS=1 S2_FS_LANE=1 \
    S2_FS_COLORS=10 S2_FS_BUCKET=896 \
    python -u exp/flagship.py northstar
echo "=== [$(date +%H:%M:%S)] campaign F done ===" >> "$LOG"
