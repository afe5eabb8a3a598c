#!/usr/bin/env python3
"""PySpark smoke test for the graft zarr connector.

The reference's roadmap lists "Python bindings" as an open item; on
Spark the bindings come for free — any DSv2 source is reachable from
PySpark through the same session extensions. This script proves it
end-to-end from Python, no Scala entry point involved:

  1. write a zarr store with df.write.format("zarr")
  2. read it back and value-check a filtered projection
  3. check pushdown evidence in the physical plan: a coordinate range
     filter prunes partitions, and COUNT(*) collapses to the metadata
     aggregate (zero data IO)
  4. append a second slab from Python and re-check totals

Run:  python3 tools/pyspark_smoke.py   (from the repo root, after
      `sbt compile`; uses the same /opt/spark jars as the JVM lanes)

Exits nonzero on any failed check. Record runs in COVERAGE.md.
"""
import glob
import os
import sys
import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

CLASSES = os.path.join(os.path.dirname(__file__), "..",
                       "target", "scala-2.13", "classes")


def main():
    classes = os.path.abspath(CLASSES)
    if not glob.glob(os.path.join(classes, "graft", "sources", "zarr", "*.class")):
        sys.exit(f"graft classes not built at {classes} — run `sbt compile` first")
    spark = (SparkSession.builder
             .master("local[4]")
             .config("spark.driver.extraClassPath", classes)
             .config("spark.executor.extraClassPath", classes)
             .config("spark.sql.extensions", "graft.GraftExtensions")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    failures = []

    def check(name, ok, detail=""):
        print(f"[pyspark-smoke] {'PASS' if ok else 'FAIL'} {name} {detail}")
        if not ok:
            failures.append(name)

    store = os.path.join(tempfile.mkdtemp(prefix="pyspark_zarr_"), "grid.zarr")

    # 1) write from Python
    df = spark.range(0, 4000).select(
        (F.col("id") / F.lit(4)).cast("long").alias("t"),
        (F.col("id") % 4).alias("x"),
        (F.col("id") * 3).alias("v"))
    (df.write.format("zarr")
       .option("coords", "t,x").option("chunkOuter", "2")
       .save(store))
    check("write", os.path.isdir(store))

    # 2) read back + filtered projection values
    back = spark.read.format("zarr").load(store)
    got = sorted((r["t"], r["x"], r["v"]) for r in
                 back.where("t >= 3 AND t <= 4").select("t", "x", "v").collect())
    want = sorted((t, x, (t * 4 + x) * 3) for t in (3, 4) for x in range(4))
    check("filtered read", got == want, f"{len(got)} rows")

    # 3a) coordinate-range pushdown reaches the zarr scan: the plan's
    # scan line carries the planned coord ranges and the pruned row
    # count (8 of 16,000 cells), the same evidence ZarrSpec pins
    pruned = back.where("t >= 3 AND t <= 4")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    check("range pushdown reaches the scan",
          "ranges=[3,5)" in plan and "rows=8" in plan
          and "GreaterThanOrEqual(t,3)" in plan,
          "scan line lacks pruned ranges" if "ranges=" not in plan else "")

    # 3b) COUNT(*) answers from metadata (plan carries the zarr agg
    # scan, not a row scan)
    cnt_df = back.groupBy().count()
    cnt_plan = cnt_df._jdf.queryExecution().executedPlan().toString()
    check("count(*) value", cnt_df.collect()[0][0] == 4000)
    check("count(*) pushed to metadata",
          "ZarrAgg" in cnt_plan or "PushedAggregates" in cnt_plan,
          "plan lacks zarr aggregate scan" if "ZarrAgg" not in cnt_plan else "")

    # 4) append a second slab from Python (Scala writer via the same
    # DataFrame API — mode("append") routes to ZarrWriter.append)
    extra = spark.range(4000, 4048).select(
        (F.col("id") / F.lit(4)).cast("long").alias("t"),
        (F.col("id") % 4).alias("x"),
        (F.col("id") * 3).alias("v"))
    extra.write.format("zarr").mode("append").save(store)
    total = spark.read.format("zarr").load(store).count()
    check("append + recount", total == 4048, f"count={total}")
    ssum = spark.read.format("zarr").load(store).agg(F.sum("v")).collect()[0][0]
    check("sum after append", ssum == sum(i * 3 for i in range(4048)))

    spark.stop()
    if failures:
        sys.exit(f"[pyspark-smoke] FAILED: {', '.join(failures)}")
    print("[pyspark-smoke] all checks passed")


if __name__ == "__main__":
    main()
