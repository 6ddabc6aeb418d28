#!/bin/bash
# Round-5 chip campaign G: jointgrid A/B — campaign D's first run combined
# NOCONTACTS=1 with JBUCKET=-1 and landed at 296 ms/step, 3x WORSE than the
# round-3 102.7 ms baseline; isolate which knob did it.
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
# (a) current-code baseline, no knobs (round-3 record: 102.7 ms/step)
run python -u exp/flagship.py jointgrid
# (b) contact-phase skip only
run env S2_FS_NOCONTACTS=1 python -u exp/flagship.py jointgrid
echo "=== [$(date +%H:%M:%S)] campaign G done ===" >> "$LOG"
