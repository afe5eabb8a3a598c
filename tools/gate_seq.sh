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
heavy = {n for n in names if n.split("_")[0] in
         {"d2","d3","d4","d5","d6","d7","c5","cp1","s1","s2","s3","s6","c4","c8"}}
light = [n for n in names if n not in heavy]
for h in sorted(heavy):
    print(h)
for i in range(0, len(light), 12):
    print(",".join(light[i:i+12]))
EOF

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
    python3 tools/compare_one.py "$SF" "$OUT" "$q" "$secs" >> "$RES" 2>&1
    tail -1 "$RES"
  done
done < "$GROUPS_FILE"

echo "=== gate done: $(grep -c '^PASS' "$RES") pass, $(grep -c '^FAIL' "$RES") fail, $(grep -c '^CRASH' "$RES") crashed (crashes retry on resume)"
