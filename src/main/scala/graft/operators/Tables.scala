package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet corpus (TESTDATA.md).
  *
  * Tables form a TPC-H-ish star schema plus `events` (stream-shaped),
  * `documents` (text corpus) and `embeddings` (vector corpus). All
  * queries in this library take a scale-factor directory so the same
  * plan runs at sf0.001 (smoke), sf0.01 (oracle) and sf0.1+ (bench) —
  * and, by extension, on a cluster-sized dataset: nothing below ever
  * collects a table to the driver.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Widen `df` to the cluster's default parallelism — and ONLY widen.
    * For explode-heavy pipelines (char-gram, token, shingle fan-outs):
    * Spark sizes scan partitions on INPUT bytes, so a small single
    * parquet file is one split and a 40x explode plus its partial
    * hash-aggregation run in ONE task at any data size (observed as a
    * single straggler doing a 145M-row hash-agg while 31 cores idled).
    * A corpus-scale scan already has thousands of splits — for it this
    * is the identity, because coalescing a 100 TB scan through a full
    * shuffle would be the opposite bug. */
  def widen(df: DataFrame): DataFrame = {
    val width = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < width) df.repartition(width) else df
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") normalizeTs(spark.read.parquet(s"$dir/$name.parquet"))
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Normalize `events.ts` to TIMESTAMP (LTZ) regardless of how the
    * corpus generator wrote it:
    *  - TIMESTAMP(NANOS) parquet reads as long under
    *    spark.sql.legacy.parquet.nanosAsLong=true (set by every graft
    *    session builder); integral `div` keeps full precision
    *    (ns epoch ≈ 1.7e18 would lose bits through a double);
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) reads as
    *    TIMESTAMP_NTZ, which time-arithmetic functions (unix_micros)
    *    reject; the cast re-interprets the naive value in the session
    *    zone (UTC for all graft entrypoints — identical instants to
    *    DuckDB's naive-timestamp epoch arithmetic).
    */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    if (!df.columns.contains("ts")) df
    else df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }

  /** Register temp views for SQL-surface queries (CTEs, subqueries, …). */
  def views(spark: SparkSession, dir: String, names: String*): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
