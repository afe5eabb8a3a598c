#!/bin/bash
# Sequential per-query sketch-family bench at sf10p.
#
# Why one JVM per query: Spark's shuffle/spill files live until the
# context shuts down (ContextCleaner only reclaims after the shuffle
# object is GC'd), so a 6-query heavy run accumulates every query's
# spill on one disk — the round-9 all-in-one sf10p run died with
# SPILL_OUT_OF_MEMORY "No space left on device". Running each query in
# its own JVM guarantees the OS reclaims /tmp spill at process exit.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/bench_sf10p_seq
mkdir -p "$OUT"
for q in d3_dedup_minhash d4_dedup_simhash d5_dedup_embedding \
         d7_dedup_clusters s2_ann_lsh s6_ann_pq; do
  echo "=== $q $(date +%T) disk_avail=$(df --output=avail -h / | tail -1 | tr -d ' ')"
  SPARK_GRAFT_SF_DIR=/root/repo/localdata/sf10p \
  SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_ONLY="$q" \
  SPARK_GRAFT_PASSES=1 \
  SPARK_DRIVER_MEM=32g \
    tools/run.sh graft.Bench > "$OUT/$q.out" 2> "$OUT/$q.err"
  rc=$?
  echo "rc=$rc"
  [ -f BENCH_DETAIL.json ] && cp BENCH_DETAIL.json "$OUT/$q.detail.json"
done
echo "=== done $(date +%T) disk_avail=$(df --output=avail -h / | tail -1 | tr -d ' ')"
