#!/bin/bash
# Round-5 chip campaign A (VERDICT r4 #1/#2): the two never-run probes that
# aim this round's optimization.
# 1) Stage profile at NORTH-STAR scale 64x1954 with the official bench
#    config (bucketed, lanes, nojoints) — the only committed profile is
#    64x211 (solve 79%); the round-5 lever must come from where time goes
#    at 1954 bodies.
# 2) Chunk-size ladder 96/112 monolithic (crash established only at >=128):
#    if per-phase fixed costs dominate, wsps grows with batch size and the
#    official hostchunk can widen.
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
    python -u exp/profile_stages.py full solve broad narrow colorinc
run env S2_FS_WORLDS=96 S2_FS_BUCKET=-1 S2_FS_NARROW=lanes S2_FS_NOJOINTS=1 \
    python -u exp/flagship.py northstar
run env S2_FS_WORLDS=112 S2_FS_BUCKET=-1 S2_FS_NARROW=lanes S2_FS_NOJOINTS=1 \
    python -u exp/flagship.py northstar
echo "=== [$(date +%H:%M:%S)] campaign A done ===" >> "$LOG"
