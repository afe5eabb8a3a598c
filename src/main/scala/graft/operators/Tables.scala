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

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark only reads as
    // long (spark.sql.legacy.parquet.nanosAsLong=true, set by every
    // graft session builder). Integral `div` keeps full precision
    // (ns epoch ≈ 1.7e18 would lose bits through a double).
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }

  /** Register temp views for SQL-surface queries (CTEs, subqueries, …). */
  def views(spark: SparkSession, dir: String, names: String*): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
