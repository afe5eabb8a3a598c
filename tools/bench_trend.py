#!/usr/bin/env python3
"""Round-over-round per-query bench trend.

Reads every BENCH_r*.json in the repo root (both shapes: the driver's
wrapper {tail, rc, ...} whose JSON line sits in the log tail, and raw
Bench detail artifacts {metric, queries, ...}), groups runs by scale
factor, and renders the per-query time trend across rounds — the
table each round's verdict used to reconstruct by hand.

A query is flagged when its last-round time moved >1.3x in either
direction vs the previous round AND is above 0.3s (scheduling noise
floor below that). Total rows carry the load fingerprint so polluted
runs read as such.

MAT artifacts (BENCH_MAT_r*.json, written by SPARK_GRAFT_MAT=1 runs)
are listed after --mat: the trend then appends a MAT-vs-count section
— queries whose materialization time diverges >3x from their count
time are count-pruned (Catalyst eliminates output-producing subtrees
under count(), so the count column under-measures them; d10's text
rebuild is the canonical case), and a ratio that GREW >1.5x vs the
previous MAT round flags a regression the count trend cannot see.

Usage: tools/bench_trend.py [--sf SF] [files...] [--mat matfiles...]
       (default: all BENCH_r*.json, sf group '0.1')
"""
import json
import glob
import os
import re
import sys


def extract(path):
    """-> (round_label, sf_label, total, nfail, load_start, {q: sec}) or None."""
    d = json.load(open(path))
    label = os.path.basename(path)[:-5].replace("BENCH_", "")
    # BENCH_DETAIL_r14.json is round 14's dense full-dict snapshot —
    # same round (and, when the driver wrote both, the same RUN) as
    # the sparse BENCH_r14.json wrapper; normalize so they merge
    label = re.sub(r"^DETAIL_(r\d+)$", r"\1", label)
    if "queries" in d and "metric" in d:  # raw detail artifact
        sf = str(d.get("sf", "?"))
        return (label, sf, d.get("value"), d.get("nfail", 0),
                d.get("load_start", ""), d["queries"],
                d.get("contaminated", False))
    tail = str(d.get("tail", ""))
    sf = str(d.get("sf", "?"))
    for line in tail.splitlines():
        i = line.find('{"metric"')
        if i >= 0:
            try:
                j = json.loads(line[i:].strip())
                return (label, str(j.get("sf", sf)), j.get("value"),
                        j.get("nfail", 0), j.get("load_start", ""),
                        j["queries"], j.get("contaminated", False))
            except Exception:
                pass
    # truncated tail (early rounds): scrape name:number pairs
    qs = {k: float(v) for k, v in
          re.findall(r'"([a-z][a-z0-9_]+)":([0-9]+\.[0-9]+)', tail)
          if not k.startswith(("load", "value", "sf"))}
    if qs:
        return (label, sf, None, 0, "", qs, False)
    return None


def norm_sf(sf):
    m = re.search(r"sf?([0-9.]+)p?$", sf)
    return m.group(1) if m else sf


def main():
    args = sys.argv[1:]
    want_sf = "0.1"
    if args[:1] == ["--sf"]:
        want_sf, args = args[1], args[2:]
    matfiles = []
    if "--mat" in args:
        i = args.index("--mat")
        args, matfiles = args[:i], args[i + 1:]
    files = args or sorted(glob.glob("BENCH_r*.json"))
    runs = [r for r in (extract(f) for f in files) if r]
    runs = [r for r in runs if norm_sf(r[1]) == want_sf]
    # A BENCH_DETAIL.json passed explicitly (label "DETAIL") is the run
    # in flight — label it as the next round so the table carries the
    # round being judged (graft.Bench regenerates the trend this way at
    # the end of every full sf0.1 run).
    rounds = [int(m.group(1)) for r in runs
              for m in [re.fullmatch(r"r(\d+)", r[0])] if m]
    cur = f"r{(max(rounds) + 1) if rounds else 1:02d}*"
    runs = [((cur,) + r[1:]) if r[0] == "DETAIL" else r for r in runs]
    if not runs:
        print(f"no runs at sf={want_sf}")
        return
    # Numeric round order regardless of argument order, then merge
    # same-round artifacts (sparse driver wrapper + dense DETAIL_r{N}
    # snapshot), keeping the larger per-query dict: last/prev is then
    # strictly round N vs round N-1 for every query both rounds ran
    # (the r13 sparse-history false-flag fix).
    def lbl_no(lbl):
        m = re.search(r"r(\d+)", lbl)
        return int(m.group(1)) if m else 10 ** 9
    runs.sort(key=lambda r: (lbl_no(r[0]), r[0].endswith("*")))
    by_label, order = {}, []
    for r in runs:
        if r[0] not in by_label:
            order.append(r[0])
            by_label[r[0]] = r
        elif len(r[5]) > len(by_label[r[0]][5]):
            by_label[r[0]] = r
    runs = [by_label[l] for l in order]
    names = sorted({q for r in runs for q in r[5]})
    cols = [r[0] for r in runs]
    print(f"# Bench trend (sf={want_sf}) — seconds per query, min-of-passes\n")
    print("| query | " + " | ".join(cols) + " | last/prev |")
    print("|" + "---|" * (len(cols) + 2))
    flagged = []
    for q in names:
        vals = [r[5].get(q) for r in runs]
        present = [v for v in vals if v is not None and v >= 0]
        ratio = ""
        if len(present) >= 2 and present[-2] > 0:
            rr = present[-1] / present[-2]
            ratio = f"{rr:.2f}x"
            if (rr > 1.3 or rr < 1 / 1.3) and max(present[-2:]) > 0.3:
                ratio += " ⚠" if rr > 1.3 else " ✓"
                flagged.append((q, present[-2], present[-1], rr))
        cells = ["" if v is None else ("FAIL" if v < 0 else f"{v:.2f}") for v in vals]
        print(f"| {q} | " + " | ".join(cells) + f" | {ratio} |")
    totals = ["" if r[2] is None else f"{r[2]:.1f}" for r in runs]
    print(f"| **total** | " + " | ".join(totals) + " | |")
    loads = [r[4].split(" ")[0] if r[4] else "" for r in runs]
    print(f"| load@start | " + " | ".join(loads) + " | |")
    nfails = [str(r[3]) for r in runs]
    print(f"| nfail | " + " | ".join(nfails) + " | |")
    if flagged:
        print("\n## Moved >1.3x last round (above the 0.3s noise floor)\n")
        # self-labeled contaminated run (zero clean passes after the
        # interference guard's retries): its flags are ambient, not code
        if len(runs[-1]) > 6 and runs[-1][6]:
            print("**NOTE: the newest run is marked `contaminated` "
                  "(interference guard found zero clean passes) — "
                  "treat these flags as machine noise, re-run idle.**\n")
        for q, a, b, rr in sorted(flagged, key=lambda x: -x[3]):
            arrow = "slower ⚠" if rr > 1 else "faster"
            print(f"- `{q}`: {a:.2f}s → {b:.2f}s ({rr:.2f}x {arrow})")
    # numeric round order, not lexicographic: "MAT_r100" must sort
    # after "MAT_r99" so last/prev pick the right pair
    def round_no(path):
        m = re.search(r"r(\d+)", os.path.basename(path))
        return int(m.group(1)) if m else -1
    mruns = [r for r in (extract(f) for f in sorted(matfiles, key=round_no)) if r]
    mruns = [r for r in mruns if norm_sf(r[1]) == want_sf]
    # `runs` can be empty when --mat files are given but no count run
    # matches the sf filter — the MAT section needs BOTH (it renders
    # MAT-vs-count ratios), so gate on both or the count_qs index dies.
    if mruns and runs:
        last = mruns[-1]
        prev = mruns[-2] if len(mruns) >= 2 else None
        count_qs = runs[-1][5]
        print(f"\n## MAT (materialization) vs count — {last[0]} "
              f"vs count {runs[-1][0]}\n")
        print("MAT times a full `toRdd.count()` walk of the physical "
              "plan's output; count() lets Catalyst prune output-"
              "producing subtrees. A large ratio means the count trend "
              "under-measures that query's real cost.\n")
        print("| query | count s | MAT s | MAT/count |" +
              (" prev MAT | growth |" if prev else ""))
        print("|---|---|---|---|" + ("---|---|" if prev else ""))
        for q in sorted(last[5]):
            mv = last[5][q]
            cv = count_qs.get(q)
            if mv is None or mv < 0 or cv is None or cv <= 0:
                continue
            ratio = mv / cv
            mark = " ⚠ count-pruned" if ratio > 3 and mv > 0.5 else ""
            row = f"| {q} | {cv:.2f} | {mv:.2f} | {ratio:.1f}x{mark} |"
            if prev:
                # previous MAT round's count partner is unknowable here;
                # compare MAT-to-MAT directly for growth
                pv = prev[5].get(q)
                growth = ""
                if pv is not None and pv > 0.3:
                    g = mv / pv
                    growth = f"{g:.2f}x" + (" ⚠" if g > 1.5 else "")
                row += f" {pv:.2f}s |" if pv is not None else " |"
                row += f" {growth} |"
            print(row)


if __name__ == "__main__":
    main()
