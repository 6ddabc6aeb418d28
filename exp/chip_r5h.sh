#!/bin/bash
# Round-5 chip campaign H: jointgrid after the narrowphase gate.
# Campaign G isolated the "regression": the default xla per-pair narrowphase
# grinds ~250 ms/step over an all-dead contact table (round-3's 102.7 ms ran
# lanes narrowphase). With solve_contacts=False the narrowphase is now
# statically skipped (exact no-op on a dead table).
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
# (a) contact phases + narrowphase statically skipped (target: >=20 wsps)
run env S2_FS_NOCONTACTS=1 python -u exp/flagship.py jointgrid
# (b) no-knobs config with the lanes narrowphase (the round-3 comparison)
run env S2_FS_NARROW=lanes python -u exp/flagship.py jointgrid
echo "=== [$(date +%H:%M:%S)] campaign H done ===" >> "$LOG"
