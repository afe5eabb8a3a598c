#!/bin/bash
# Resumable full correctness gate at big SF (sf1p/sf10p): runs each
# query group in its OWN JVM (shuffle/spill files are reclaimed at
# process exit — the all-in-one sf10p run died on disk, SCALE.md),
# then hash-compares against the DuckDB oracle immediately, appending
# one PASS/FAIL line per query to the results file. Re-running skips
# queries already decided, so a crash resumes where it left off.
#
# Heavy queries (pair-generating dedup/ANN + quadratic c5) run solo;
# everything else batches ~12 per JVM to amortize session startup.
#
# Usage: tools/gate_seq.sh <sfdir> <outdir> [shuffle=256]
set -u
cd "$(dirname "$0")/.."
SF="${1:?sfdir}"; OUT="${2:?outdir}"; SHUF="${3:-256}"
RES="$OUT/results.txt"
mkdir -p "$OUT"; touch "$RES"

# seed oracle_sql.json with one cheap query if missing
if [ ! -f "$OUT/oracle_sql.json" ]; then
  SPARK_GRAFT_CPUS=8 tools/run.sh graft.Verify "$SF" "$OUT" q42_datetime \
    > /dev/null 2>&1
fi

GROUPS_FILE="$OUT/groups.txt"
python3 - "$OUT" > "$GROUPS_FILE" <<'EOF'
import json, sys
names = sorted(json.load(open(f"{sys.argv[1]}/oracle_sql.json")))
# d8/d9/d10 are heavy: d9 walks every corpus token twice, d10 rebuilds
# the full cleaned text (500k wide-string rows at sf10p) — batching
# them 12-per-JVM with light queries starved the batch of spill room
heavy = {n for n in names if n.split("_")[0] in
         {"d2","d3","d4","d5","d6","d7","d8","d9","d10","d13",
          "c5","cp1","s1","s2","s3","s6","c4","c8","t14"}}
light = [n for n in names if n not in heavy]
for h in sorted(heavy):
    print(h)
for i in range(0, len(light), 12):
    print(",".join(light[i:i+12]))
EOF

compare_of() {  # pick compare by spark output row count OR byte size
  # (same selection as my_gate_lane.sh: compare_one's Python tuple
  # fetch OOMs both on >2M rows and on full-text outputs — d10's
  # 500k-row cleaned corpus — while compare_big's in-DuckDB EXCEPT ALL
  # handles both)
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

while read -r group; do
  todo=""
  for q in ${group//,/ }; do
    grep -Eq "^PASS $q |^FAIL $q[: ]" "$RES" || todo="$todo,$q"
  done
  todo="${todo#,}"
  [ -z "$todo" ] && continue
  echo "=== $todo $(date +%T) avail=$(df --output=avail -h / | tail -1 | tr -d ' ')"
  t0=$SECONDS
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SHUFFLE="$SHUF" SPARK_DRIVER_MEM=48g \
    tools/run.sh graft.Verify "$SF" "$OUT" "$todo" \
    > "$OUT/last_verify.log" 2>&1
  rc=$?
  secs=$((SECONDS - t0))
  [ $rc -ne 0 ] && echo "verify rc=$rc for $todo (see $OUT/last_verify.log)"
  for q in ${todo//,/ }; do
    # A query is compared only when its Spark write COMMITTED (output
    # dir with _SUCCESS). Otherwise record CRASH — a marker the resume
    # grep deliberately does NOT match, so a transient JVM death
    # (sandbox OOM, contention) retries on the next run instead of
    # freezing into a 'FAIL: no spark output' that needs a hand-edit
    # (same discipline as my_gate_lane.sh; FAIL is reserved for real
    # engine-vs-oracle divergence from the compare tools).
    if [ ! -f "$OUT/$q/_SUCCESS" ]; then
      echo "CRASH $q: no committed spark output (verify rc=$rc, see $OUT/last_verify.log) — will retry on resume" >> "$RES"
      tail -1 "$RES"
      continue
    fi
    cmp=$(compare_of "$q")
    python3 "tools/$cmp" "$SF" "$OUT" "$q" "$secs" >> "$RES" 2>&1
    tail -1 "$RES"
  done
done < "$GROUPS_FILE"

echo "=== gate done: $(grep -c '^PASS' "$RES") pass, $(grep -c '^FAIL' "$RES") fail, $(grep -c '^CRASH' "$RES") crashed (crashes retry on resume)"
