#!/bin/bash
# Gated quiet-bench: poll steal each minute; ONLY launch the full bench when
# (a) the last minute was calm (<1 steal jiffy/s) and (b) no other sbt/java
# build of ours is running (so the row isn't polluted by our own dev load).
# Unlike quiet_bench.sh this never burns 10 min on a known-stormy run.
# Exits 0 on a quiet row, 3 when the deadline passes without one.
set -u
THRESH=${1:-800}
DEADLINE_MIN=${2:-300}   # give up after this many minutes
cd /root/repo
start=$(date +%s)
attempt=0
tmpdir=$(mktemp -d /tmp/gated.XXXXXX)   # per-run attempt files, no cross-invocation buildup
deadline_passed() {
  local m=$(( ($(date +%s) - start) / 60 ))
  [ "$m" -ge "$DEADLINE_MIN" ]
}
while :; do
  elapsed_min=$(( ($(date +%s) - start) / 60 ))
  if deadline_passed; then
    echo "[gated] deadline ${DEADLINE_MIN}m passed, no quiet row"
    exit 3
  fi
  s1=$(awk '/^cpu /{print $9}' /proc/stat); sleep 60
  s2=$(awk '/^cpu /{print $9}' /proc/stat)
  rate=$(( (s2 - s1) / 60 ))
  echo "[gated] t+${elapsed_min}m steal rate $rate/s"
  # re-check AFTER the sample so a calm minute landing past the deadline
  # cannot launch a whole bench run beyond it
  if deadline_passed; then
    echo "[gated] deadline ${DEADLINE_MIN}m passed, no quiet row"
    exit 3
  fi
  if [ "$rate" -ge 1 ]; then continue; fi
  # calm minute — but don't launch on top of our own build/test load.
  # NOT pgrep: background tasks run in their own sandbox PID namespace
  # and cannot see sibling processes (measured: two concurrent benches
  # at t+62m of the r17 session). /proc/loadavg is host-wide.
  load1=$(awk '{print int($1)}' /proc/loadavg)
  if [ "$load1" -ge 2 ]; then
    echo "[gated] calm steal but load1=$load1 (our own sbt/test/verify) — holding"
    continue
  fi
  attempt=$((attempt + 1))
  echo "[gated] calm minute + idle repo — launching bench attempt $attempt"
  mtime_before=$(stat -c %Y BENCH_FULL.json 2>/dev/null || echo 0)
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' > "$tmpdir/gated_attempt_$attempt.json"
  sbt_status=${PIPESTATUS[0]}
  mtime_after=$(stat -c %Y BENCH_FULL.json 2>/dev/null || echo 0)
  if [ "$sbt_status" -ne 0 ] || [ "$mtime_after" -le "$mtime_before" ]; then
    echo "[gated] attempt $attempt FAILED (sbt exit $sbt_status) — not a candidate"
    continue
  fi
  steal=$(python3 -c "import json; print(json.load(open('BENCH_FULL.json'))['steal_jiffies'])")
  total=$(python3 -c "import json; print(json.load(open('BENCH_FULL.json'))['total'])")
  cp BENCH_FULL.json "$tmpdir/gated_full_attempt_$attempt.json"
  echo "[gated] attempt $attempt: total=$total steal=$steal"
  if [ "$steal" -lt "$THRESH" ]; then
    echo "[gated] QUIET row landed on attempt $attempt"
    exit 0
  fi
done
