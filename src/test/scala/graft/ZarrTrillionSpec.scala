package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's 1-Trillion-Row-Challenge roadmap item
  * (/root/reference/README.md:337), Spark-side: a metadata-only store
  * describing a 10^12-row grid (100k time × 1k lat × 10k lon; no data
  * chunks on disk — all fill). Statistics-answered aggregates must
  * return instantly with zero chunk IO at ANY grid size, and the
  * scan planner must NOT materialize millions of partition objects —
  * the driver heap and scheduler are the bottleneck before the
  * executors are. */
class ZarrTrillionSpec extends AnyFunSuite {
  import TestSession._

  private val T = 100000 // time
  private val A = 1000 // lat
  private val B = 10000 // lon
  private val totalRows = T.toLong * A * B // 10^12

  private lazy val store: String = {
    val base = Files.createTempDirectory("zarr_1trc").toString
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
    def longs(n: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(n * 8).order(ByteOrder.LITTLE_ENDIAN)
      (0 until n).foreach(i => b.putLong(i.toLong)); b.array()
    }
    w("time/.zarray", meta(Seq(T), Seq(T))); w("time/0", longs(T))
    w("lat/.zarray", meta(Seq(A), Seq(A))); w("lat/0", longs(A))
    w("lon/.zarray", meta(Seq(B), Seq(B))); w("lon/0", longs(B))
    // data variable: metadata ONLY — zero chunk files, 10^7 chunks
    // in the grid, every cell is fill
    w("temperature/.zarray", meta(Seq(T, A, B), Seq(1, 100, 1000)))
    base
  }

  private def zarr = spark.read.format("zarr").load(store)

  private def scanDesc(df: DataFrame): String = {
    df.count()
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }.getOrElse("")
  }

  test("COUNT/MIN/MAX over 10^12 rows answer from metadata instantly") {
    val t0 = System.nanoTime()
    val df = zarr.agg(count(lit(1)).as("n"), min("time").as("mnt"),
      max("time").as("mxt"), max("lon").as("mxl"))
    assert(scanDesc(df).contains("ZarrAggScan"), scanDesc(df))
    val r = df.collect().head
    assert(r.getLong(0) == totalRows)
    assert(r.getLong(1) == 0L && r.getLong(2) == T - 1L && r.getLong(3) == B - 1L)
    assert((System.nanoTime() - t0) < 30e9, "metadata aggregate took >30s")
  }

  test("GROUP BY lat COUNT over 10^12 rows: grid arithmetic, zero chunk IO") {
    val df = zarr.groupBy("lat").agg(count(lit(1)).as("n"))
    assert(scanDesc(df).contains("ZarrGroupAggScan"), scanDesc(df))
    val got = df.collect()
    assert(got.length == A)
    assert(got.forall(_.getLong(1) == T.toLong * B))
  }

  test("scan planning stays bounded: ~maxPartitions chunk-aligned slices") {
    val np = zarr.select("time", "temperature").rdd.getNumPartitions
    // target ≈ 10^12/32768 rows; merging lands between target and
    // 2×target, so the count sits in [maxPartitions/2, maxPartitions]
    assert(np <= 32768, s"partition explosion: $np")
    assert(np >= 10000, s"too few partitions for a large cluster: $np")
    // an explicit override scales the target accordingly
    val np2 = spark.read.format("zarr").option("maxPartitions", "1000")
      .load(store).select("temperature").rdd.getNumPartitions
    assert(np2 <= 1000 && np2 >= 300, s"override ignored: $np2")
  }

  test("LIMIT pushdown reads a handful of cells out of 10^12") {
    val rows = zarr.limit(3).collect()
    assert(rows.length == 3)
    // row-major: lon varies fastest; absent chunks read as fill 0
    assert(rows.map(_.toSeq).toSeq == Seq(
      Seq(0L, 0L, 0L, 0L), Seq(0L, 0L, 1L, 0L), Seq(0L, 0L, 2L, 0L)))
  }

  test("coordinate-equality filter prunes 10^12 rows to one slab") {
    val df = zarr.filter(col("time") === 12345 && col("lat") === 500)
      .select("lon", "temperature")
    val got = df.count()
    assert(got == B.toLong)
    assert(scanDesc(df.limit(1)).contains("rows="), scanDesc(df.limit(1)))
  }
}
