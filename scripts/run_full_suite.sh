#!/bin/bash
# Full-suite CI record (VERDICT r3 weak #5 / next-round #8): run EVERY test
# file including the `slow` torch-oracle parity profile, one file at a time
# (a single `-m ""` run exceeds 50 min on this 1-vCPU box and gives no
# incremental signal), appending per-file counts + wall time to a log that is
# committed with the round as the proof-of-green artifact.
#
# Usage: bash scripts/run_full_suite.sh [logfile]
set -u -o pipefail
cd "$(dirname "$0")/.."
LOG=${1:-ci_full_suite.log}
echo "=== full-suite run $(date -u +%FT%TZ) @ $(git rev-parse --short HEAD) ===" >> "$LOG"
overall_rc=0
for f in tests/test_*.py; do
  t0=$SECONDS
  line=$(python -m pytest "$f" -q -m "" -p no:cacheprovider 2>&1 | tail -1)
  rc=$?
  [ $rc -ne 0 ] && overall_rc=$rc
  echo "$f: ${line} ($(( SECONDS - t0 ))s, rc=$rc)" >> "$LOG"
done
echo "=== done $(date -u +%FT%TZ) rc=$overall_rc ===" >> "$LOG"
exit $overall_rc
