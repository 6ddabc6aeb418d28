#!/bin/bash
# Round-4 chip campaign, part C: color-bucketed solve measurements.
# Stages (each its own process; one compile per question):
#   bench64b   — 64x211 pyramid, bucket auto  (compare: lanes10 = 683.4 wsps)
#   bench128b  — official bench shape with bucket auto (compare: 955.6 wsps)
#   ns64b      — north star 64 worlds, bucket auto (compare: 91.3 wsps)
#   ns512bc    — north star 512 worlds, chunk 64 + bucket auto
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
LOG=exp/chip_r4.log
run() {
  echo "=== [$(date +%H:%M:%S)] $* ===" >> "$LOG"
  timeout 3600 "$@" >> "$LOG" 2>&1
  echo "=== [$(date +%H:%M:%S)] rc=$? ===" >> "$LOG"
}
for stage in "${@:-bench64b bench128b ns64b ns512bc}"; do
  case "$stage" in
    bench64b)  run env S2_BENCH_WORLDS=64 S2_BENCH_BUCKET=-1 python -u bench.py ;;
    bench128b) run env S2_BENCH_WORLDS=128 S2_BENCH_BUCKET=-1 python -u bench.py ;;
    ns64b)     run env S2_FS_WORLDS=64 S2_FS_BUCKET=-1 S2_FS_NARROW=lanes python -u exp/flagship.py northstar ;;
    ns512bc)   run env S2_FS_WORLDS=512 S2_FS_CHUNK=64 S2_FS_BUCKET=-1 S2_FS_NARROW=lanes python -u exp/flagship.py northstar ;;
    jgridb)    run env S2_FS_JBUCKET=-1 S2_FS_NARROW=lanes python -u exp/flagship.py jointgrid ;;
    *) echo "unknown stage $stage" >> "$LOG" ;;
  esac
done
echo "=== [$(date +%H:%M:%S)] campaign C done ===" >> "$LOG"
