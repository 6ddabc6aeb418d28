#!/bin/bash
# Full-suite run for the per-round TESTLOG artifact (VERDICT r3 #6).
# Per-file invocations so one hang can't eat the whole run; fast files first
# so regressions surface early. Appends one summary line per file plus a
# final tally to TESTLOG_rN.txt.
# Usage: bash exp/run_suite.sh [round] [resume]   (default: 04)
#   resume: keep the existing TESTLOG and only run files it has no PASSING
#   line for yet (fills in a run that was cut off by a session restart).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}"
ROUND="${1:-04}"
MODE="${2:-fresh}"
OUT="TESTLOG_r${ROUND}.txt"

if [ "$MODE" != "resume" ] || [ ! -e "$OUT" ]; then
  echo "# Test log round ${ROUND} — $(date -u +%Y-%m-%dT%H:%M:%SZ)" > "$OUT"
  echo "# git $(git rev-parse --short HEAD 2>/dev/null) ($(git status --porcelain | wc -l) dirty files)" >> "$OUT"
else
  echo "# resumed $(date -u +%Y-%m-%dT%H:%M:%SZ) at git $(git rev-parse --short HEAD 2>/dev/null)" >> "$OUT"
fi

# fast unit files first, behavior/oracle files last; test_narrow_lanes runs
# LAST (ADVICE r4) — it hit the 4h per-file timeout once (round 4) and must
# not starve any file behind it
FILES="test_math_geometry.py test_gather.py test_handles.py test_coloring.py \
test_broadphase.py test_gjk.py test_manifold.py \
test_native.py test_queries.py test_bucketed.py test_lane_solve.py test_aux.py test_dryrun.py \
test_color_overflow.py test_scenes.py test_pallas_solver.py test_behavior.py \
test_solvers.py test_large_scenes.py test_narrow_lanes.py"

HEAD_HASH=$(git rev-parse --short HEAD 2>/dev/null)
fail=0
for f in $FILES; do
  [ -e "tests/$f" ] || continue
  # resume only trusts green lines recorded at the SAME commit (ADVICE r4:
  # a resumed log must not mix pass results from two code versions)
  if [ "$MODE" = "resume" ] && grep -q "^tests/$f: .*rc=0 git=${HEAD_HASH}\]" "$OUT"; then
    continue
  fi
  t0=$(date +%s)
  timeout 14400 python -m pytest "tests/$f" -q > /tmp/suite_one.log 2>&1
  rc=$?
  dt=$(( $(date +%s) - t0 ))
  echo "tests/$f: $(tail -1 /tmp/suite_one.log)  [${dt}s rc=$rc git=${HEAD_HASH}]" >> "$OUT"
  # preserve the full log of any failing file (round 5: a segfaulting file
  # left only its last line behind, which was a faulthandler fragment)
  [ $rc -ne 0 ] && cp /tmp/suite_one.log "/tmp/suitefail_${f%.py}.log"
  [ $rc -ne 0 ] && fail=1
done
echo "# done $(date -u +%Y-%m-%dT%H:%M:%SZ) overall_fail=$fail" >> "$OUT"
exit $fail
