#!/bin/bash
# Sequential per-query sketch-family bench for perturbed-corpus scale
# probes. Usage: tools/bench_sf10p_seq.sh <sfdir> <tag> [shuffle] [passes]
#   e.g. tools/bench_sf10p_seq.sh localdata/sf1p  sf1p  256 3
#        tools/bench_sf10p_seq.sh localdata/sf10p sf10p 256 1
#
# Why one JVM per query: Spark's shuffle/spill files live until the
# context shuts down (ContextCleaner only reclaims after the shuffle
# object is GC'd), so a 6-query heavy run accumulates every query's
# spill on one disk — the round-9 all-in-one sf10p run died with
# SPILL_OUT_OF_MEMORY "No space left on device". Running each query in
# its own JVM guarantees the OS reclaims /tmp spill at process exit.
#
# Why shuffle=256 (not =cores): partition count must track data volume;
# at sf10p a 32-partition band-join shuffle put ~0.5 GB single
# allocations in 32 concurrent tasks and OOM'd a 32 GB heap. Compare
# scales only at the SAME shuffle setting.
set -u
cd "$(dirname "$0")/.."
SF="${1:?sfdir}"; TAG="${2:?tag}"; SHUF="${3:-256}"; PASSES="${4:-1}"
OUT="/tmp/bench_seq_$TAG"
mkdir -p "$OUT"
for q in d3_dedup_minhash d4_dedup_simhash d5_dedup_embedding \
         d7_dedup_clusters s2_ann_lsh s6_ann_pq; do
  echo "=== $q $(date +%T) disk_avail=$(df --output=avail -h / | tail -1 | tr -d ' ')"
  SPARK_GRAFT_SF_DIR="$(readlink -f "$SF")" \
  SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_SHUFFLE="$SHUF" \
  SPARK_GRAFT_ONLY="$q" \
  SPARK_GRAFT_PASSES="$PASSES" \
  SPARK_DRIVER_MEM=32g \
    tools/run.sh graft.Bench > "$OUT/$q.out" 2> "$OUT/$q.err"
  rc=$?
  echo "rc=$rc"
  [ -f BENCH_DETAIL.json ] && cp BENCH_DETAIL.json "$OUT/$q.detail.json"
done
echo "=== done $(date +%T) disk_avail=$(df --output=avail -h / | tail -1 | tr -d ' ')"
