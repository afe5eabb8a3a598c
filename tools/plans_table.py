#!/usr/bin/env python3
"""Regenerate PLANS.md from `graft.PlanDump` output.

Usage: tools/run.sh graft.PlanDump /root/testdata/sf0.01 > /tmp/plandump.txt
       python3 tools/plans_table.py /tmp/plandump.txt > PLANS.md
"""
import re
import sys

HEADER = """# PLANS — physical-plan audit of every gate query (sf0.01, explain formatted)

Generated from `graft.PlanDump` (regenerate with
`tools/run.sh graft.PlanDump /root/testdata/sf0.01` +
`tools/plans_table.py`). Columns: shuffle exchanges (non-broadcast),
broadcast exchanges, broadcast hash joins, sort-merge joins, broadcast
nested-loop joins, cartesian products, whole-stage-codegen spans,
TakeOrdered (top-k without a full sort). Scalar-subquery sub-plans
(e.g. c12's bloom build) are folded into their parent query's counts.
Streaming queries (st1-st7) execute per-micro-batch plans audited by
their specs; z9/z12's streams likewise.

| query | shuffles | bcast ex | BHJ | SMJ | BNLJ | cartesian | codegen | top-k |
|---|---|---|---|---|---|---|---|---|
"""


def main(path):
    text = open(path, errors="replace").read()
    sections = re.split(r"^===== (\S+) =====$", text, flags=re.M)[1:]
    # Spark's formatted explain emits its own "===== Subqueries ====="
    # separator — fold those sub-plans into the parent query's body
    merged = []
    for name, body in zip(sections[0::2], sections[1::2]):
        if name == "Subqueries" and merged:
            merged[-1] = (merged[-1][0], merged[-1][1] + body)
        else:
            merged.append((name, body))
    rows = []
    for name, body in merged:
        # formatted explain lists each operator in the tree AND as a
        # numbered detail header "(N) OperatorName" — count the headers
        ops = re.findall(r"^\(\d+\) (\w+)", body, flags=re.M)
        shuffles = ops.count("Exchange")
        bcast = ops.count("BroadcastExchange")
        bhj = ops.count("BroadcastHashJoin")
        smj = ops.count("SortMergeJoin")
        bnlj = ops.count("BroadcastNestedLoopJoin")
        cart = ops.count("CartesianProduct")
        codegen = len(set(re.findall(r"codegen id : (\d+)", body)))
        topk = ops.count("TakeOrderedAndProject")
        rows.append((name, shuffles, bcast, bhj, smj, bnlj, cart, codegen, topk))
    out = [HEADER.rstrip("\n")]
    for r in sorted(rows):
        out.append("| " + " | ".join(str(c) for c in r) + " |")
    print("\n".join(out))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/plandump.txt")
