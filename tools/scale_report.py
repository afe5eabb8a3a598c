#!/usr/bin/env python3
"""Per-query scaling report: sf0.1 -> sf1 (10x rows).

Reads two Bench detail artifacts (same machine, same harness) and
emits a markdown table of time ratios normalized by the DATA-EXPECTED
work ratio. Expected != 10 for the pair-generating operators, because
the driver's corpus is a fixed-31-word-vocabulary synthetic: every
gram's doc frequency scales with N, so candidate volumes measured in
DuckDB grow ~100x on 10x docs (a corpus property, not an engine one —
see SCALE.md). Efficiency = time_ratio / work_ratio; <= ~1.2 means
the engine scales linearly in work.

Usage: tools/scale_report.py BENCH_sf01.json BENCH_sf1.json
"""
import json, math, sys

# Data-expected work ratios on 10x rows. Measured ones (DuckDB over the
# actual corpora) are exact; "analytic" ones follow from the same
# replication argument (10x-sized key groups -> 100x pairs).
EXPECTED = {
    # round 8: the absolute df ceiling (maxDf=25) bounds d2's candidate
    # volume at O(N); on THIS corpus the capped rare set is empty at sf1
    # (fixed vocab saturates — min df 30 > 25), so d2's work is the
    # linear gram pipeline alone. Uncapped it measured 1.03e6 -> 1.04e8.
    "d2_dedup_ngram": (10.0, "capped (maxDf=25): gram pipeline is linear; rare set empty at sf1"),
    "d6_dedup_apply": (10.0, "anti-join over d2's (capped) pair table"),
    "d3_dedup_minhash": (100.0, "analytic: identical signatures across replicas -> 100x band-collision pairs"),
    "d4_dedup_simhash": (100.0, "analytic: identical sketches -> 100x band-collision pairs"),
    "d5_dedup_embedding": (100.0, "all-pairs by definition: 20000^2 / 2000^2"),
    "d7_dedup_clusters": (100.0, "edge table is d3's pair output"),
    "c5_editdist_pairs": (102.2, "measured: (lang, n_chars//16) blocked pairs 1.00e5 -> 1.03e7"),
    "s1_ann_brute": (100.0, "brute force: queries x corpus, both 10x"),
    "s2_ann_lsh": (100.0, "analytic: replicas of a bucket collide -> 100x in-bucket pairs"),
    "s3_ann_ivf": (100.0, "queries x probed-cluster size, both 10x"),
    "s6_ann_pq": (100.0, "queries x ADC scan, both 10x"),
    "cp1_pipeline": (10.0, "its d2-shaped dedup stage is capped too (round 8)"),
}

def load(p):
    d = json.load(open(p))
    return {k: v for k, v in d["queries"].items() if v >= 0}, d

def main():
    a, da = load(sys.argv[1] if len(sys.argv) > 1 else "BENCH_r07_sf01_local.json")
    b, db = load(sys.argv[2] if len(sys.argv) > 2 else "BENCH_r07_sf1.json")
    rows = []
    for q in sorted(a):
        if q not in b:
            continue
        t0, t1 = a[q], b[q]
        ratio = t1 / t0 if t0 > 0 else float("nan")
        exp, why = EXPECTED.get(q, (10.0, ""))
        eff = ratio / exp
        rows.append((q, t0, t1, ratio, exp, eff, why))
    rows.sort(key=lambda r: -r[5])
    print(f"sf0.1 total {da['value']}s (load {da['load_start']}) | "
          f"sf1 total {db['value']}s (load {db['load_start']}) | "
          f"nfail {da['nfail']}/{db['nfail']}")
    print()
    print("| query | t(sf0.1) s | t(sf1) s | ratio | expected work | efficiency |")
    print("| --- | --- | --- | --- | --- | --- |")
    for q, t0, t1, ratio, exp, eff, why in rows:
        mark = " **<-**" if eff > 1.5 and t1 > 0.5 else ""
        print(f"| {q} | {t0:.3f} | {t1:.3f} | {ratio:.1f}x | {exp:.0f}x | {eff:.2f}{mark} |")
    flagged = [(q, eff, t1) for q, _, t1, _, _, eff, _ in rows if eff > 1.5 and t1 > 0.5]
    print()
    print(f"{len(flagged)} queries above 1.5x the expected-work ratio with sf1 time > 0.5s:")
    for q, eff, t1 in flagged:
        print(f"  {q}: {eff:.2f}x expected ({t1:.2f}s at sf1)")

if __name__ == "__main__":
    main()
