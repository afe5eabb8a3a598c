#!/usr/bin/env python3
"""Big-output variant of compare_one.py: the row-set compare runs
ENTIRELY inside DuckDB as two EXCEPT ALL anti-differences (exact
multiset equality — strictly stronger than the hash compare) instead
of materializing both sides as Python tuple lists. compare_one.py
tops out around a few million rows (two pylist copies + canon copies
+ sort); at 100x gate scale q10 emits 60M rows and the Python path
would need >100 GB. DuckDB streams both sides with all cores.

Column alignment mirrors compare_one's canon: both sides are selected
by SORTED column name, and the spark side is CAST column-by-column to
the oracle result's types (set-op semantics then treat NULLs as equal,
like canon's (0,"") normalization).

The cast is guarded: it is only applied when it is LOSSLESS (identical
types, integer widening, FLOAT->DOUBLE, decimal scale/precision
widening, int->decimal with enough integer digits). Any other type
pair FAILs loudly — a lossy cast (e.g. spark DOUBLE where the oracle
says BIGINT) would round BEFORE the compare and could turn a real
value divergence into a false PASS, and this tool is used exactly on
the >2M-row outputs where it is the only check.

Usage: tools/compare_big.py <sfdir> <verify_out> <query> [spark_secs]
"""
import sys, json, glob, os, re, time
import duckdb

INT_RANK = {"TINYINT": 1, "SMALLINT": 2, "INTEGER": 3,
            "BIGINT": 4, "HUGEINT": 5}
INT_DIGITS = {1: 3, 2: 5, 3: 10, 4: 19, 5: 39}


def lossless_cast(src, dst):
    """True iff CAST(src AS dst) cannot lose or round information."""
    src, dst = src.strip().upper(), dst.strip().upper()
    if src == dst:
        return True
    rs, rd = INT_RANK.get(src), INT_RANK.get(dst)
    if rs and rd:
        return rs <= rd
    if src == "FLOAT" and dst == "DOUBLE":
        return True
    ms = re.fullmatch(r"DECIMAL\((\d+),(\d+)\)", src)
    md = re.fullmatch(r"DECIMAL\((\d+),(\d+)\)", dst)
    if ms and md:
        ps, ss = int(ms.group(1)), int(ms.group(2))
        pd, sd = int(md.group(1)), int(md.group(2))
        return sd >= ss and (pd - sd) >= (ps - ss)
    if rs and md:  # integer into a decimal with enough integer digits
        pd, sd = int(md.group(1)), int(md.group(2))
        return (pd - sd) >= INT_DIGITS[rs]
    return False

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
spath = f"{outdir}/{name}"
if not os.path.isdir(spath):
    print(f"FAIL {name}: no spark output (spark {spark_secs}s)"); sys.exit(1)

t0 = time.time()
try:
    # A VIEW, deliberately NOT a temp-table materialization: DuckDB's
    # CREATE TABLE AS sink serializes UNION ALL branch pipelines
    # (measured 128 s vs 9 s for the sliced d5 oracle at sf1p), while
    # aggregate sinks (the COUNT and the EXCEPT ALL below) run the
    # branches concurrently — so evaluating the view twice in parallel
    # is far cheaper than materializing it once serially.
    con.execute(f"CREATE VIEW oracle AS ({sql})")
    ocols = [(r[0], r[1]) for r in con.execute(
        "DESCRIBE oracle").fetchall()]
    con.execute(
        f"CREATE VIEW sparkout AS SELECT * FROM '{spath}/*.parquet'")
    scols = {r[0]: r[1] for r in con.execute("DESCRIBE sparkout").fetchall()}
except Exception as e:
    print(f"FAIL {name}: setup error {e}"); sys.exit(1)

if sorted(c for c, _ in ocols) != sorted(scols):
    print(f"FAIL {name}: columns spark={sorted(scols)} "
          f"duck={sorted(c for c, _ in ocols)}"); sys.exit(1)

drift = [(c, scols[c], t) for c, t in ocols
         if not lossless_cast(scols[c], t)]
if drift:
    print(f"FAIL {name}: lossy type drift (spark->oracle would round "
          f"before compare): {drift}"); sys.exit(1)

sel_o = ", ".join(f'"{c}"' for c, _ in sorted(ocols))
sel_s = ", ".join(f'CAST("{c}" AS {t}) AS "{c}"'
                  for c, t in sorted(ocols))
def attempt(c):
    nrows_s, nrows_o = (
        c.execute("SELECT (SELECT COUNT(*) FROM sparkout), "
                  "(SELECT COUNT(*) FROM oracle)").fetchone())
    if nrows_s != nrows_o:
        print(f"FAIL {name}: rows spark={nrows_s} duck={nrows_o}")
        sys.exit(1)
    # exact multiset equality: equal cardinality + empty one-sided
    # anti-difference implies empty difference in both directions
    diff = c.execute(
        f"SELECT COUNT(*) FROM (SELECT {sel_s} FROM sparkout "
        f"EXCEPT ALL SELECT {sel_o} FROM oracle)").fetchone()[0]
    return nrows_s, diff


try:
    nrows_s, diff = attempt(con)
except Exception as e:
    # Heavy string oracles (ordered string_agg over hundreds of
    # millions of token rows) can blow DuckDB's memory accounting at
    # 32 threads while fitting easily at 8 — thread-local sort/agg
    # state multiplies with parallelism. Retry once, degraded.
    if "Out of Memory" not in str(e) and not isinstance(e, MemoryError):
        print(f"FAIL {name}: duckdb error {e}"); sys.exit(1)
    # Degraded retries: thread-local sort/agg state multiplies with
    # parallelism, and insertion-order preservation buffers whole
    # pipeline outputs per thread — both sinks here (COUNT, EXCEPT
    # ALL) are order-free, so dropping order + threads is semantics-
    # neutral. Two tiers: threads=8 handles the usual 32-thread
    # accounting blow-ups; threads=4 is what the d10 full-text oracle
    # (ordered string_agg over ~10^8 tokens) needs at sf10p (r14:
    # OOM'd at 8 with 100 GB free, passed at 4 in 119 s).
    done = False
    for tier in (8, 4):
        try:
            con.close()
            con = duckdb.connect()
            con.execute("SET TimeZone='UTC'")
            con.execute(f"SET threads={tier}")
            con.execute("SET preserve_insertion_order=false")
            con.execute(f"SET temp_directory='/tmp/duck_tmp_{os.getpid()}r{tier}'")
            con.execute("SET max_temp_directory_size='55GiB'")
            for f in glob.glob(f"{sfdir}/*.parquet"):
                t2 = os.path.basename(f)[:-8]
                con.execute(f"CREATE VIEW {t2} AS SELECT * FROM '{f}'")
            con.execute(f"CREATE VIEW oracle AS ({sql})")
        except Exception as e2:
            print(f"FAIL {name}: setup error on retry {e2}"); sys.exit(1)
        try:
            con.execute(
                f"CREATE VIEW sparkout AS SELECT * FROM '{spath}/*.parquet'")
            print(f"[compare_big] {name}: OOM — retrying at threads={tier}, "
                  "order-free", file=sys.stderr)
            nrows_s, diff = attempt(con)
            done = True
            break
        except Exception as e2:
            if "Out of Memory" not in str(e2) and not isinstance(e2, MemoryError):
                print(f"FAIL {name}: duckdb error {e2} (threads={tier} retry)")
                sys.exit(1)
    if not done:
        print(f"FAIL {name}: duckdb OOM persists through threads=8 and "
              "threads=4 order-free retries"); sys.exit(1)
dsecs = round(time.time() - t0, 1)
if diff:
    print(f"FAIL {name}: {diff}/{nrows_s} spark rows not in oracle multiset")
    sys.exit(1)
print(f"PASS {name} ({nrows_s} rows, spark {spark_secs}s, duckdb {dsecs}s, exceptall)")
