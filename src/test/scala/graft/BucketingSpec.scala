package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Tables

/** Co-located join via bucketing — the shuffle-free fact-fact join
  * SCALE.md claims for repeated joins on a stable key: both tables
  * bucketed by the join key into the same bucket count join with NO
  * shuffle exchange on either side (each task reads matching buckets).
  * At 100 TB this converts the per-query O(data) exchange into a
  * write-once layout cost. */
class BucketingSpec extends AnyFunSuite {
  import TestSession._

  test("bucketed tables join without a shuffle exchange") {
    val wh = Files.createTempDirectory("graft_bucket_wh")
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS cust_bkt")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the exchange question is real
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Tables.load(spark, sf, "orders")
        .write.bucketBy(8, "o_custkey")
        .option("path", wh.resolve("orders_bkt").toString)
        .saveAsTable("orders_bkt")
      Tables.load(spark, sf, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
        .write.bucketBy(8, "c_custkey")
        .option("path", wh.resolve("cust_bkt").toString)
        .saveAsTable("cust_bkt")

      val joined = spark.table("orders_bkt")
        .join(spark.table("cust_bkt"),
          col("o_custkey") === col("c_custkey"))
      val shuffles = joined.queryExecution.sparkPlan.collect {
        case e: ShuffleExchangeLike => e
      }
      assert(shuffles.isEmpty,
        s"expected shuffle-free bucketed join, got:\n${joined.queryExecution.sparkPlan}")

      // and the result matches the plain (shuffled) join
      val expected = Tables.load(spark, sf, "orders")
        .join(Tables.load(spark, sf, "customer"),
          col("o_custkey") === col("c_custkey"))
        .count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS cust_bkt")
    }
  }
}
