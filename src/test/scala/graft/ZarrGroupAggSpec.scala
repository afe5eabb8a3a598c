package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GROUP BY coordinate answered from metadata — the grouped
  * generalization of the reference's COUNT/MIN-MAX optimizer rules:
  * the grid is a full Cartesian product, so per-group counts and
  * coordinate bounds are pure grid arithmetic, zero chunk IO. */
class ZarrGroupAggSpec extends AnyFunSuite {
  import TestSession._

  private val store = "src/test/resources/zarr/synthetic_v3.zarr"
  private def zarr = spark.read.format("zarr").load(store)

  private def scanDesc(df: DataFrame): String = {
    df.count()
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }.getOrElse("")
  }

  test("GROUP BY one coordinate: counts and bounds from metadata only") {
    val df = zarr.groupBy("time").agg(
      count(lit(1)).as("n"), min("lat").as("min_lat"),
      max("lon").as("max_lon"), max("time").as("max_time"))
    assert(scanDesc(df).contains("ZarrGroupAggScan"), scanDesc(df))
    val got = df.orderBy("time").collect()
    assert(got.length == 7)
    got.zipWithIndex.foreach { case (r, t) =>
      assert(r.getLong(0) == t) // time
      assert(r.getLong(1) == 100L) // 10 lat × 10 lon
      assert(r.getLong(2) == 0L) // global min(lat): exact per group (full product)
      assert(r.getLong(3) == 9L)
      assert(r.getLong(4) == t.toLong) // max of the grouped coord = the group value
    }
  }

  test("GROUP BY two coordinates") {
    val df = zarr.groupBy("time", "lat").agg(count(lit(1)).as("n"))
    assert(scanDesc(df).contains("ZarrGroupAggScan"), scanDesc(df))
    val got = df.collect()
    assert(got.length == 70)
    assert(got.forall(_.getLong(2) == 10L))
  }

  test("guards: data-var group key or any filter takes the real scan") {
    val byVar = zarr.groupBy("temperature").agg(count(lit(1)).as("n"))
    assert(!scanDesc(byVar).contains("GroupAgg"), scanDesc(byVar))
    assert(byVar.agg(sum("n")).collect().head.getLong(0) == 700L)
    val filtered = zarr.filter(col("temperature") > 0).groupBy("time").count()
    assert(!scanDesc(filtered).contains("GroupAgg"), scanDesc(filtered))
    // differential: grouped pushdown ≡ post-scan aggregation
    val pushed = zarr.groupBy("time").agg(count(lit(1)).as("n"))
      .orderBy("time").collect().map(_.toSeq).toSeq
    val real = zarr.filter(col("temperature") > Int.MinValue) // blocks pushdown
      .groupBy("time").agg(count(lit(1)).as("n"))
      .orderBy("time").collect().map(_.toSeq).toSeq
    assert(pushed == real)
  }
}
