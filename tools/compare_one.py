#!/usr/bin/env python3
"""Single-query version of compare.py for the resumable big-SF gate
(tools/gate_seq.sh): compares one Spark output dir against its DuckDB
oracle and prints one PASS/FAIL line (plus timing if given).

Usage: tools/compare_one.py <sfdir> <verify_out> <query> [spark_secs]
"""
import sys, json, glob, os, time
import duckdb
import pyarrow.parquet as pq

sfdir, outdir, name = sys.argv[1], sys.argv[2], sys.argv[3]
spark_secs = sys.argv[4] if len(sys.argv) > 4 else "?"

con = duckdb.connect()
con.execute("SET TimeZone='UTC'")
# Per-process spill dir: concurrent compares in one cwd share DuckDB's
# default ".tmp/duckdb_temp_storage-N.tmp" NAMES and tread on each
# other; stale spill from killed runs also accumulates silently. The
# cap makes a runaway oracle fail loudly instead of filling the disk.
con.execute(f"SET temp_directory='/tmp/duck_tmp_{os.getpid()}'")
con.execute("SET max_temp_directory_size='55GiB'")
for f in glob.glob(f"{sfdir}/*.parquet"):
    t = os.path.basename(f)[:-8]
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{f}'")

sql = json.load(open(f"{outdir}/oracle_sql.json"))[name]


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    def norm(v):
        if v is None: return (0, "")
        if isinstance(v, bool): return (1, str(int(v)))
        if isinstance(v, float): return (1, repr(v))
        if isinstance(v, int): return (1, str(v))
        return (1, str(v))
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


spath = f"{outdir}/{name}"
if not os.path.isdir(spath):
    print(f"FAIL {name}: no spark output (spark {spark_secs}s)"); sys.exit(1)
try:
    t = pq.read_table(spath)
    scols = t.column_names
    srows = [tuple(row[c] for c in scols) for row in t.to_pylist()]
except Exception as e:
    print(f"FAIL {name}: spark read error {e}"); sys.exit(1)
t0 = time.time()


def run_oracle(c):
    res = c.execute(sql)
    return [d[0] for d in res.description], res.fetchall()


try:
    dcols, drows = run_oracle(con)
except (MemoryError, Exception) as e:
    # Heavy string oracles (ordered string_agg over hundreds of
    # millions of token rows) can blow DuckDB's memory accounting at
    # 32 threads while fitting easily at 8 — thread-local sort/agg
    # state multiplies with parallelism. Retry once, degraded.
    if "Out of Memory" not in str(e) and not isinstance(e, MemoryError):
        print(f"FAIL {name}: duckdb error {e}"); sys.exit(1)
    try:
        con.close()
        con = duckdb.connect()
        con.execute("SET TimeZone='UTC'")
        con.execute("SET threads=8")
        con.execute(f"SET temp_directory='/tmp/duck_tmp_{os.getpid()}r'")
        con.execute("SET max_temp_directory_size='55GiB'")
        for f in glob.glob(f"{sfdir}/*.parquet"):
            t2 = os.path.basename(f)[:-8]
            con.execute(f"CREATE VIEW {t2} AS SELECT * FROM '{f}'")
        print(f"[compare_one] {name}: OOM at default threads — retrying at threads=8", file=sys.stderr)
        dcols, drows = run_oracle(con)
    except Exception as e2:
        print(f"FAIL {name}: duckdb error {e2} (after threads=8 OOM retry)"); sys.exit(1)
dsecs = round(time.time() - t0, 1)
sc, sr = canon(scols, srows)
dc, dr = canon(dcols, drows)
if sc != dc:
    print(f"FAIL {name}: columns spark={sc} duck={dc}"); sys.exit(1)
if len(sr) != len(dr):
    print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}"); sys.exit(1)
if sr != dr:
    bad = sum(1 for a, b in zip(sr, dr) if a != b)
    print(f"FAIL {name}: {bad}/{len(sr)} differing rows"); sys.exit(1)
print(f"PASS {name} ({len(sr)} rows, spark {spark_secs}s, duckdb {dsecs}s)")
