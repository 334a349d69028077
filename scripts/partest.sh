#!/usr/bin/env bash
# Parallel test-suite runner: same tests as `python -m pytest tests/ -x -q`,
# split file-wise across N concurrent pytest processes (each a separate
# Spark session capped at a few cores) so a 32-core host finishes the
# suite in minutes instead of hours. test_streaming.py runs SOLO at the
# end: its kill-and-resume exactly-once tests are wall-clock sensitive
# and flake under full-suite CPU contention (ROUND7_NOTES.md:169-177).
set -u
cd "$(dirname "$0")/.."
N=${PARTEST_JOBS:-8}
CORES=${PARTEST_CORES:-6}
OUT=${PARTEST_OUT:-/tmp/partest}
mkdir -p "$OUT"
rm -f "$OUT"/g*.log "$OUT"/streaming.log

mapfile -t FILES < <(ls tests/test_*.py | grep -v test_streaming.py)
for i in $(seq 0 $((N - 1))); do
  GROUP=()
  for j in "${!FILES[@]}"; do
    if (( j % N == i )); then GROUP+=("${FILES[$j]}"); fi
  done
  # an empty group would make pytest collect the WHOLE suite
  # (including test_streaming.py concurrently) — skip it
  (( ${#GROUP[@]} )) || continue
  SPARK_GRAFT_CPUS=$CORES python -m pytest "${GROUP[@]}" -q \
    > "$OUT/g$i.log" 2>&1 &
  PIDS[$i]=$!
done

FAIL=0
for i in $(seq 0 $((N - 1))); do
  wait "${PIDS[$i]}" || { echo "GROUP $i FAILED (log: $OUT/g$i.log)"; FAIL=1; }
done

SPARK_GRAFT_CPUS=8 python -m pytest tests/test_streaming.py -q \
  > "$OUT/streaming.log" 2>&1 || { echo "STREAMING FAILED"; FAIL=1; }

grep -hE "^[0-9]+ (passed|failed)|failed|error" "$OUT"/g*.log "$OUT"/streaming.log | sort | uniq -c
exit $FAIL
