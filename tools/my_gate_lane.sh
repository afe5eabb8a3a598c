#!/bin/bash
# Parallel lane for the big-SF gate: Spark sides run sequentially in
# this lane; each finished query's DuckDB compare launches in the
# background (the slow oracles are single-core, so compares overlap
# the next Spark run). Results append to the SAME results file the
# main gate_seq.sh run uses — it greps before starting a query, so
# finished ones are skipped there.
# Usage: tools/my_gate_lane.sh <sfdir> <outdir> "<q1 q2 ...>" [shuffle]
set -u
cd "$(dirname "$0")/.."
SF="${1:?}"; OUT="${2:?}"; QUERIES="${3:?}"; SHUF="${4:-256}"
RES="$OUT/results.txt"
mkdir -p "$OUT"; touch "$RES"   # grep below must not error on first run

compare_of() {  # pick compare by spark output row count OR byte size
  # (row count alone is the wrong proxy for full-text outputs: d10's
  # 500k-row cleaned-corpus dump OOM'd compare_one's Python fetch at
  # sf10p while compare_big's in-DuckDB EXCEPT ALL ran it in 56 s)
  local q="$1"
  local n
  n=$(python3 - "$OUT/$q" <<'EOF'
import sys, glob, os
import pyarrow.parquet as pq
fs = glob.glob(f"{sys.argv[1]}/*.parquet")
rows = sum(pq.read_metadata(f).num_rows for f in fs)
mb = sum(os.path.getsize(f) for f in fs) // (1024 * 1024)
print("big" if rows > 2000000 or mb > 40 else "small")
EOF
)
  if [ "$n" = "big" ]; then echo compare_big.py; else echo compare_one.py; fi
}

for q in $QUERIES; do
  # PASS lines read "PASS <q> (...", FAIL lines "FAIL <q>: ..." — anchor
  # both delimiters so a query whose name prefixes another's is not
  # wrongly skipped (e.g. "d1" vs "d1_dedup_exact" style collisions).
  if grep -Eq "^PASS $q |^FAIL $q[: ]" "$RES"; then echo "skip $q"; continue; fi
  echo "=== spark $q $(date +%T) avail=$(df --output=avail -h / | tail -1 | tr -d ' ')"
  t0=$SECONDS
  SPARK_GRAFT_CPUS=28 SPARK_GRAFT_SHUFFLE="$SHUF" SPARK_DRIVER_MEM=48g \
    tools/run.sh graft.Verify "$SF" "$OUT" "$q" > "$OUT/lane_$q.log" 2>&1
  rc=$?
  secs=$((SECONDS - t0))
  if [ $rc -ne 0 ]; then
    # record the crash VISIBLY but with a marker the skip-greps (here
    # and in gate_seq.sh) do NOT match: a transient kill (sandbox OOM,
    # contention — documented sf10p realities) must be retried on the
    # next resume, not frozen into a permanent FAIL that needs a
    # hand-edit; engine-vs-oracle divergence is only ever recorded by
    # the compare tools as FAIL
    echo "CRASH $q: spark exited rc=$rc after ${secs}s (see $OUT/lane_$q.log) — will retry on resume" >> "$RES"
    echo "verify rc=$rc for $q"; continue
  fi
  cmp=$(compare_of "$q")
  echo "--- compare($cmp) $q launched bg after ${secs}s"
  ( python3 "tools/$cmp" "$SF" "$OUT" "$q" "$secs" >> "$RES" 2>&1 ) &
done
echo "=== lane spark sides done $(date +%T); waiting on compares"
wait
echo "=== lane done $(date +%T)"
