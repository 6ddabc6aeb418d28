#!/bin/bash
# Round-5 chip campaign D: (1) jointgrid with the empty-contact-phase skip
# (config.solve_contacts) and the 4-color joint grid (VERDICT r4 #6:
# jointgrid >= 20 wsps, joint_error <= 1.55); (2) per-solver throughput
# sweep at the round-3 bench scale (VERDICT r4 #5).
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
# jointgrid baseline was 102.7 ms/step = 9.7 wsps (round 3)
run env S2_FS_NOCONTACTS=1 S2_FS_JBUCKET=-1 \
    python -u exp/flagship.py jointgrid
run env S2_FS_NOCONTACTS=1 S2_FS_JBUCKET=-1 S2_FS_JCOLORS=5 \
    python -u exp/flagship.py jointgrid
# ten-solver sweep, one JSON line each (64 worlds x 211 bodies x 20 steps)
run python -u exp/solver_sweep.py
echo "=== [$(date +%H:%M:%S)] campaign D done ===" >> "$LOG"
