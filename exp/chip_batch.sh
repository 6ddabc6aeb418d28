#!/bin/bash
# Sequential on-chip experiment batch (one tunnel compile per question).
# Usage: bash exp/chip_batch.sh [stage ...]
# Stages: probe variants lanespallas jointpallas bf16 pyramid100 jointgrid northstar
# Default (no args): jointpallas lanespallas pyramid100 northstar
# Output: appends to exp/chip_batch.log with timestamps.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export S2_FS_NARROW="${S2_FS_NARROW:-lanes}"
# northstar @1024 worlds needs 23.76G HBM vs 15.75G available (round-3 log);
# 512 fits (~12G incl. step temporaries)
export S2_FS_WORLDS="${S2_FS_WORLDS:-512}"
LOG=exp/chip_batch.log

run() {
  echo "=== [$(date +%H:%M:%S)] $* ===" >> "$LOG"
  timeout 3600 "$@" >> "$LOG" 2>&1
  echo "=== [$(date +%H:%M:%S)] rc=$? ===" >> "$LOG"
}

for stage in "${@:-jointpallas lanespallas pyramid100 northstar}"; do
  for s in $stage; do
    case "$s" in
      probe)      run python -u exp/pallas_vmem_probe.py 896 ;;
      variants)   run python -u exp/step_variants.py pallas10 ;;
      lanespallas) run python -u exp/step_variants.py lanespallas10 ;;
      jointpallas) run python -u exp/chip_joint_pallas.py ;;
      bf16)       run python -u exp/bf16_incidence_probe.py ;;
      pyramid100) run python -u exp/flagship.py pyramid100 ;;
      jointgrid)  run python -u exp/flagship.py jointgrid ;;
      northstar)  run python -u exp/flagship.py northstar ;;
      *) echo "unknown stage $s" >> "$LOG" ;;
    esac
  done
done
echo "=== [$(date +%H:%M:%S)] batch done ===" >> "$LOG"
