#!/bin/bash
# Retry the full bench until a quiet-steal row lands (or attempts run out).
# Each attempt: wait for a calm 60s, run Bench, keep the row if its
# steal_jiffies < threshold. Saves every attempt aside for forensics.
set -u
THRESH=${1:-800}
MAX=${2:-6}
cd /root/repo
for i in $(seq 1 "$MAX"); do
  # wait for a calm minute (rate < 1/s) before spending 7 min on a run
  for w in $(seq 1 20); do
    s1=$(awk '/^cpu /{print $9}' /proc/stat); sleep 60
    s2=$(awk '/^cpu /{print $9}' /proc/stat)
    rate=$(( (s2 - s1) / 60 ))
    echo "[quiet_bench] attempt $i pre-wait $w: steal rate $rate/s"
    [ "$rate" -lt 1 ] && break
  done
  mtime_before=$(stat -c %Y BENCH_FULL.json 2>/dev/null || echo 0)
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' > /tmp/bench_attempt_$i.json
  sbt_status=${PIPESTATUS[0]}
  mtime_after=$(stat -c %Y BENCH_FULL.json 2>/dev/null || echo 0)
  # a failed/aborted run must not let a STALE BENCH_FULL.json masquerade
  # as this attempt's quiet row
  if [ "$sbt_status" -ne 0 ] || [ "$mtime_after" -le "$mtime_before" ]; then
    echo "[quiet_bench] attempt $i FAILED (sbt exit $sbt_status, BENCH_FULL.json $( [ "$mtime_after" -le "$mtime_before" ] && echo stale || echo fresh )) — not a candidate row"
    continue
  fi
  steal=$(python3 -c "import json; print(json.load(open('BENCH_FULL.json'))['steal_jiffies'])")
  total=$(python3 -c "import json; print(json.load(open('BENCH_FULL.json'))['total'])")
  cp BENCH_FULL.json /tmp/bench_full_attempt_$i.json
  echo "[quiet_bench] attempt $i: total=$total steal=$steal"
  if [ "$steal" -lt "$THRESH" ]; then
    echo "[quiet_bench] QUIET row landed on attempt $i"
    exit 0
  fi
done
echo "[quiet_bench] no quiet row in $MAX attempts"
exit 3
