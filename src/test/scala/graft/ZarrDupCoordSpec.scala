package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Zarr does not forbid duplicate coordinate values; foreign-written
  * stores can carry them. Every metadata shortcut that assumes
  * index-order = value-order (TopN clipping, declared ordering,
  * grouped/count-distinct aggregate pushdown) must refuse and take the
  * exact path. */
class ZarrDupCoordSpec extends AnyFunSuite {
  import TestSession._

  /** t = [5, 5] (duplicate!), x = [0, 1, 2] (lengths differ so the
    * dimension order t-major is unambiguous), v[t][x] = 100·t+10·x. */
  private lazy val store: String = {
    val base = Files.createTempDirectory("zarr_dup").toString
    def w(rel: String, bytes: Array[Byte]): Unit = {
      val p = Paths.get(base, rel)
      Files.createDirectories(p.getParent)
      Files.write(p, bytes)
    }
    w(".zgroup", """{"zarr_format":2}""".getBytes)
    def meta(shape: Seq[Int], chunks: Seq[Int]) =
      s"""{"zarr_format":2,"shape":[${shape.mkString(",")}],
          "chunks":[${chunks.mkString(",")}],"dtype":"<i8","fill_value":0,
          "order":"C","filters":null,"dimension_separator":".","compressor":null}""".getBytes
    def longs(vs: Seq[Long]): Array[Byte] = {
      val b = ByteBuffer.allocate(vs.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      vs.foreach(b.putLong); b.array()
    }
    w("t/.zarray", meta(Seq(2), Seq(2))); w("t/0", longs(Seq(5L, 5L)))
    w("x/.zarray", meta(Seq(3), Seq(3))); w("x/0", longs(Seq(0L, 1L, 2L)))
    w("v/.zarray", meta(Seq(2, 3), Seq(2, 3)))
    w("v/0.0", longs(Seq(100L, 101L, 102L, 110L, 111L, 112L)))
    base
  }

  private def zarr = spark.read.format("zarr").load(store)

  test("TopN is not clipped: ORDER BY t, x LIMIT 2 returns both x=0 rows") {
    val df = zarr.orderBy("t", "x").select("t", "x", "v").limit(2)
    df.count()
    val desc = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }.getOrElse("")
    assert(desc.contains("limit=-1"), desc) // not pushed
    assert(df.collect().map(_.toSeq).toSeq ==
      Seq(Seq(5L, 0L, 100L), Seq(5L, 0L, 110L)))
    // the first two GRID rows are (5,0,100),(5,1,101) — a clipped scan
    // could never return the second (5,0) row, so this proves no clip
  }

  test("grouped and distinct aggregates take the real scan and stay exact") {
    val g = zarr.groupBy("t").agg(count(lit(1)).as("n"))
    g.count()
    val desc = g.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }.getOrElse("")
    assert(!desc.contains("GroupAgg"), desc)
    assert(g.collect().map(_.toSeq).toSeq == Seq(Seq(5L, 6L)))
    assert(zarr.agg(countDistinct("t")).collect().head.getLong(0) == 1L)
  }

  test("declared ordering stops at the duplicate key") {
    // [t] alone is still sorted (constant), so that sort is elided…
    val just_t = zarr.sortWithinPartitions("t")
    just_t.count()
    assert(just_t.queryExecution.executedPlan.collect { case s: SortExec => s }.isEmpty)
    // …but [t, x] is NOT provided by the scan (x restarts under the
    // duplicate t), so the sort must stay and the output be sorted
    val tx = zarr.sortWithinPartitions("t", "x").select("t", "x", "v")
    tx.count()
    assert(tx.queryExecution.executedPlan.collect { case s: SortExec => s }.nonEmpty)
    assert(tx.collect().map(_.getLong(1)).toSeq == Seq(0L, 0L, 1L, 1L, 2L, 2L))
  }
}
