#!/usr/bin/env python3
"""Dev-time replica of the driver's correctness gate.

Reads the Verify output dir (spark result parquet per query +
oracle_sql.json), runs each oracle in DuckDB over the same sf dir,
sorts columns by name and rows by value, and compares.

Usage: tools/compare.py [sfdir] [verify_out]
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
con.execute("SET TimeZone='UTC'")
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(f)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(cols, rows):
    """Sort columns by name, then rows; normalize values."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    def norm(v):
        if v is None: return (0, "")
        if isinstance(v, bool): return (1, str(int(v)))
        if isinstance(v, float):
            return (1, repr(v))
        if isinstance(v, int): return (1, repr(float(v)) if False else str(v))
        return (1, str(v))
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out

n_pass = n_fail = 0
for name, sql in sorted(oracle.items()):
    spath = f"{outdir}/{name}"
    if not os.path.isdir(spath):
        print(f"FAIL {name}: no spark output"); n_fail += 1; continue
    try:
        t = pq.read_table(spath)
        scols = t.column_names
        srows = [tuple(row[c] for c in scols) for row in t.to_pylist()]
    except Exception as e:
        print(f"FAIL {name}: spark read error {e}"); n_fail += 1; continue
    try:
        res = con.execute(sql)
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
    except Exception as e:
        print(f"FAIL {name}: duckdb error {e}"); n_fail += 1; continue
    sc, sr = canon(scols, srows)
    dc, dr = canon(dcols, drows)
    if sc != dc:
        print(f"FAIL {name}: columns spark={sc} duck={dc}"); n_fail += 1; continue
    if len(sr) != len(dr):
        print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}"); n_fail += 1; continue
    if sr != dr:
        bad = sum(1 for a, b in zip(sr, dr) if a != b)
        print(f"FAIL {name}: {bad}/{len(sr)} differing rows")
        for a, b in zip(sr, dr):
            if a != b:
                print(f"  spark: {a}\n  duck : {b}"); break
        n_fail += 1; continue
    print(f"PASS {name} ({len(sr)} rows)")
    n_pass += 1

print(f"\n{n_pass} pass, {n_fail} fail")
sys.exit(1 if n_fail else 0)
