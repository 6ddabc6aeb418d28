#!/bin/bash
# Round-5 chip campaign J: promote the campaign-I winner (colors=9, cap 896:
# ns64 1056.7 wsps ovf 0 vs 969.7 at colors 10) to the official bench shape,
# and probe one step further down (colors=8 needs cap >= 7936/8 = 992).
# Caps 832/800 at colors 10 REGRESSED with overflow (952.5 ovf 4 / 959.8
# ovf 24) — 896 stands.
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
# (a) official bench shape at colors=9 (the candidate new default; this run
# also warms /tmp/jaxcache with the exact program the driver will execute)
run env S2_BENCH_COLORS=9 python -u bench.py
# (b) colors=8 probe at ns64 (cap 992 = exact uniform share; watch ovf)
run env S2_FS_WORLDS=64 S2_FS_NARROW=lanes S2_FS_NOJOINTS=1 S2_FS_LANE=1 \
    S2_FS_COLORS=8 S2_FS_BUCKET=992 python -u exp/flagship.py northstar
echo "=== [$(date +%H:%M:%S)] campaign J done ===" >> "$LOG"
