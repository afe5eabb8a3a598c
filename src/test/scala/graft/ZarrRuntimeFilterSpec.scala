package graft

import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.zarr.ZarrScan

/** Runtime (join-driven) pruning on the Zarr scan:
  * SupportsRuntimeV2Filtering narrows coordinate ranges from the build
  * side's join-key values before partitions are planned. */
class ZarrRuntimeFilterSpec extends AnyFunSuite {
  import TestSession._

  private val v3 = "src/test/resources/zarr/synthetic_v3.zarr"

  private def freshScan(): ZarrScan = {
    val df = spark.read.format("zarr")
      .option("minRowsPerPartition", "1").load(v3)
    df.queryExecution.sparkPlan
      .collect { case b: BatchScanExec => b.scan }.head.asInstanceOf[ZarrScan]
  }

  test("IN predicate on the outer coordinate prunes partitions") {
    val scan = freshScan()
    assert(scan.planInputPartitions().length == 7) // one per time chunk
    scan.filter(Array(new Predicate("IN", Array(
      Expressions.column("time"),
      Expressions.literal(2L), Expressions.literal(4L)))))
    val parts = scan.planInputPartitions()
    assert(parts.length == 3) // bounding range [2,5) = 3 time slabs
    assert(scan.description().contains("[2,5)"))
  }

  test("runtime filter matching nothing yields zero partitions") {
    val scan = freshScan()
    scan.filter(Array(new Predicate("=", Array(
      Expressions.column("time"), Expressions.literal(99L)))))
    assert(scan.planInputPartitions().isEmpty)
  }

  test("non-coordinate / malformed predicates are ignored") {
    val scan = freshScan()
    scan.filter(Array(new Predicate("IN", Array(
      Expressions.column("temperature"), Expressions.literal(1L)))))
    assert(scan.planInputPartitions().length == 7)
  }

  test("join through the scan stays correct with pruning available") {
    val dim = spark.range(2).select((col("id") + 2).as("t"))
    val z = spark.read.format("zarr").load(v3)
    val joined = z.join(dim, col("time") === col("t"))
    assert(joined.count() == 200) // 2 time values x 100 cells
    val sums = joined.groupBy("time").agg(count(lit(1)).as("n")).collect()
    assert(sums.forall(_.getAs[Long]("n") == 100))
  }
}
