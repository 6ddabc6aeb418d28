#!/bin/bash
# Round-5 chip campaign I: the two env-var-only levers left on the round-6
# candidate list (CLAUDE.md): tighter bucket capacity and >=1024 worlds.
# Probes run at ns64 via flagship (prints pen/ovf/contacts so an overflow
# from a too-tight cap is visible); the winner is then promoted to bench.py
# defaults and the official bench re-run to warm /tmp/jaxcache.
# Baselines (this round): ns64 lane c10 cap896 = 525.7 wsps;
# official 512x1954 hostchunk64 = 1043.9 wsps.
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
# (a) cap ladder at colors=10 (uniform share = 7936/10 = 794; 896 = 1.13x)
run env S2_FS_WORLDS=64 S2_FS_NARROW=lanes S2_FS_NOJOINTS=1 S2_FS_LANE=1 \
    S2_FS_COLORS=10 S2_FS_BUCKET=832 python -u exp/flagship.py northstar
run env S2_FS_WORLDS=64 S2_FS_NARROW=lanes S2_FS_NOJOINTS=1 S2_FS_LANE=1 \
    S2_FS_COLORS=10 S2_FS_BUCKET=800 python -u exp/flagship.py northstar
# (b) colors=9 (uniform share 882, cap 896 = 1.016x): fewer serialized
# phases IF the capacity-aware coloring still fits — watch ovf, expect risk
run env S2_FS_WORLDS=64 S2_FS_NARROW=lanes S2_FS_NOJOINTS=1 S2_FS_LANE=1 \
    S2_FS_COLORS=9 S2_FS_BUCKET=896 python -u exp/flagship.py northstar
# (c) 1024 worlds, official bench shape (state ~12G total as 16 host chunks)
run env S2_BENCH_WORLDS=1024 python -u bench.py
echo "=== [$(date +%H:%M:%S)] campaign I done ===" >> "$LOG"
