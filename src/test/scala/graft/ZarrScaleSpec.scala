package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ERA5-shaped scale test (FIXTURES.md §2 look-alike, generated
  * locally): time(3) × hybrid(2) × latitude(721) × longitude(1440)
  * ≈ 6.23M rows, float32 data, time-major chunks — the reference's
  * realistic-scale fixture shape. Verifies the connector's behavior
  * and the BASELINE.md filter-reduction arithmetic (time+hybrid fixed
  * ⇒ 1,038,240 of 6,229,440 rows ≈ 83.3% reduction) at a scale where
  * partitioned reads actually matter. */
class ZarrScaleSpec extends AnyFunSuite {
  import TestSession._

  private val T = 3; private val H = 2; private val LAT = 721; private val LON = 1440

  private lazy val store: String = {
    val base = Files.createTempDirectory("era5_like").toString
    def writeJson(rel: String, s2: String): Unit = {
      val p = Paths.get(base, rel)
      Files.createDirectories(p.getParent)
      Files.write(p, s2.getBytes)
    }
    writeJson(".zgroup", """{"zarr_format":2}""")
    def meta(shape: Seq[Int], chunks: Seq[Int], dtype: String) =
      s"""{"zarr_format":2,"shape":[${shape.mkString(",")}],
          "chunks":[${chunks.mkString(",")}],"dtype":"$dtype","fill_value":0,
          "order":"C","filters":null,"dimension_separator":".","compressor":null}"""
    def writeCoord(name: String, values: Seq[Double], dtype: String): Unit = {
      writeJson(s"$name/.zarray", meta(Seq(values.length), Seq(values.length), dtype))
      val buf = ByteBuffer.allocate(values.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      if (dtype == "<i8") values.foreach(v => buf.putLong(v.toLong))
      else values.foreach(buf.putDouble)
      Files.write(Paths.get(base, name, "0"), buf.array())
    }
    writeCoord("time", Seq(1095744.0, 1095745.0, 1095746.0), "<i8")
    writeCoord("hybrid", Seq(135.0, 136.0), "<f8")
    writeCoord("latitude", (0 until LAT).map(i => 90.0 - i * 0.25), "<f8")
    writeCoord("longitude", (0 until LON).map(i => i * 0.25), "<f8")
    // temperature[t,h,lat,lon] float32, chunks (1,1,721,1440) — one
    // chunk per (t,h) slab like ARCO-ERA5's time-major layout
    writeJson("temperature/.zarray", meta(Seq(T, H, LAT, LON), Seq(1, 1, LAT, LON), "<f4"))
    for (t <- 0 until T; h <- 0 until H) {
      val buf = ByteBuffer.allocate(LAT * LON * 4).order(ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i < LAT * LON) {
        buf.putFloat(((t * 7 + h * 3 + i) % 1000).toFloat)
        i += 1
      }
      Files.write(Paths.get(base, "temperature", s"$t.$h.0.0"), buf.array())
    }
    base
  }

  private def df = spark.read.format("zarr").load(store)

  test("6.23M-row grid: schema, count via metadata, partitioned scan") {
    assert(df.count() == 6229440L) // answered from statistics, no IO
    assert(df.columns.toSeq ==
      Seq("time", "hybrid", "latitude", "longitude", "temperature"))
    val parts = df.rdd.getNumPartitions
    assert(parts >= T, s"expected >= $T partitions, got $parts") // one per time slab
  }

  test("filter reduction matches the reference arithmetic (83.3%)") {
    val t0 = System.nanoTime()
    val n = df.filter(col("time") === 1095745L && col("hybrid") === 136.0).count()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(n == 1038240L) // 1 * 1 * 721 * 1440
    info(f"filtered scan (1.04M rows): $secs%.2fs")
    assert(secs < 60)
  }

  test("range pushdown prunes the ERA5 shape before IO (2 of 3 time slabs)") {
    val fdf = df.filter(col("time") >= 1095745L && col("latitude") >= 0.0)
    val scanDesc = fdf.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s.scan.description()
    }.head
    assert(scanDesc.contains("GreaterThanOrEqual(time,1095745)"), scanDesc)
    val n = fdf.count()
    assert(n < 6229440L / 2, s"range pushdown should cut the scan, counted $n")
  }

  test("full-scan aggregate throughput") {
    val t0 = System.nanoTime()
    val rows = df.groupBy("time").agg(
      avg("temperature").as("t_avg"), count(lit(1)).as("n")).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(rows.length == T && rows.forall(_.getAs[Long]("n") == H * LAT * LON))
    info(f"full 6.23M-row scan+agg: $secs%.2fs (${6229440 / secs / 1e6}%.1fM rows/s)")
    assert(secs < 120)
  }

  test("float-coordinate epsilon filter on the 0.25-degree grid") {
    val n = df.filter(col("latitude") === 45.25 && col("longitude") === 300.0).count()
    assert(n == T * H)
  }

  test("maxRowsPerPartition splits the 3 outer slabs into a cluster's worth of work") {
    // Outer-only partitioning caps this store at 3-way parallelism
    // (the reference ERA5 shape has 3 time steps). Sub-slab splitting
    // at inner-chunk-aligned rows lifts the cap without changing
    // results or double-decoding chunks.
    val split = spark.read.format("zarr")
      .option("maxRowsPerPartition", 300000L).load(store)
    val parts = split.rdd.getNumPartitions
    assert(parts == 21, s"expected 3 outer x 7 sub-slices, got $parts")
    assert(split.count() == 6229440L)
    // value-level equality with the default read on a spot filter
    val a = df.filter(col("time") === 1095745L)
      .agg(sum(col("temperature").cast("long")), count(lit(1))).collect()(0)
    val b = split.filter(col("time") === 1095745L)
      .agg(sum(col("temperature").cast("long")), count(lit(1))).collect()(0)
    assert(a == b)
  }

  test("inner-chunked variant decodes each chunk once (band cache at ERA5 shape)") {
    // Same grid, but spatially chunked (1,1,103,360): 7x4=28 inner
    // chunks per (t,h) slab. The row-major walk revisits the 4
    // longitude chunks on every latitude row — 721x amplification
    // without the band cache.
    val base = Files.createTempDirectory("era5_inner").toString
    def writeJson(rel: String, s2: String): Unit = {
      val p = Paths.get(base, rel)
      Files.createDirectories(p.getParent)
      Files.write(p, s2.getBytes)
    }
    writeJson(".zgroup", """{"zarr_format":2}""")
    def meta(shape: Seq[Int], chunks: Seq[Int], dtype: String) =
      s"""{"zarr_format":2,"shape":[${shape.mkString(",")}],
          "chunks":[${chunks.mkString(",")}],"dtype":"$dtype","fill_value":0,
          "order":"C","filters":null,"dimension_separator":".","compressor":null}"""
    def writeCoord(name: String, n: Int): Unit = {
      writeJson(s"$name/.zarray", meta(Seq(n), Seq(n), "<i8"))
      val buf = ByteBuffer.allocate(n * 8).order(ByteOrder.LITTLE_ENDIAN)
      (0 until n).foreach(i => buf.putLong(i.toLong))
      Files.write(Paths.get(base, name, "0"), buf.array())
    }
    val (t, lat, lon, cLat, cLon) = (2, 721, 1440, 103, 360)
    writeCoord("time", t); writeCoord("latitude", lat); writeCoord("longitude", lon)
    writeJson("v/.zarray", meta(Seq(t, lat, lon), Seq(1, cLat, cLon), "<f4"))
    for (ti <- 0 until t; la <- 0 until (lat + cLat - 1) / cLat; lo <- 0 until lon / cLon) {
      val buf = ByteBuffer.allocate(cLat * cLon * 4).order(ByteOrder.LITTLE_ENDIAN)
      (0 until cLat * cLon).foreach(i => buf.putFloat((i % 100).toFloat))
      Files.write(Paths.get(base, "v", s"$ti.$la.$lo"), buf.array())
    }
    val frame = spark.read.format("zarr").load(base)
    val q = frame.agg(sum("v"))
    val before = graft.sources.zarr.ChunkIO.decodeCount.get()
    q.collect()
    val decoded = graft.sources.zarr.ChunkIO.decodeCount.get() - before
    val nChunks = t * ((lat + cLat - 1) / cLat) * (lon / cLon) // 2*7*4 = 56
    assert(decoded == nChunks, s"expected $nChunks decodes, got $decoded")
  }
}
