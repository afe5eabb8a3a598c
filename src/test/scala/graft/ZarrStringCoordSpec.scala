package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** String coordinates (`|S<n>` fixed-width ASCII) — the reference's
  * roadmap "string/datetime coordinates" (README.md:319). Store:
  * station(|S4: "alp","bern","cgn") × hour(int64: 0..3) with an int64
  * reading grid. String equality filters translate to index-space
  * pruning; numeric pruning machinery never touches string dims. */
class ZarrStringCoordSpec extends AnyFunSuite {
  import TestSession._

  private lazy val store: Path = {
    val root = Files.createTempDirectory("zarr_strcoord")
    def writeJson(rel: String, s2: String): Unit = {
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.write(p, s2.getBytes)
    }
    writeJson(".zgroup", """{"zarr_format":2}""")
    def meta(shape: Seq[Int], chunks: Seq[Int], dtype: String) =
      s"""{"zarr_format":2,"shape":[${shape.mkString(",")}],
          "chunks":[${chunks.mkString(",")}],"dtype":"$dtype","fill_value":0,
          "order":"C","filters":null,"dimension_separator":".","compressor":null}"""
    // station |S4, padded with NULs
    writeJson("station/.zarray", meta(Seq(3), Seq(3), "|S4"))
    val st = Array("alp", "bern", "cgn")
    val sbuf = ByteBuffer.allocate(3 * 4)
    st.foreach { n =>
      val b = n.getBytes("US-ASCII")
      sbuf.put(java.util.Arrays.copyOf(b, 4))
    }
    Files.write(root.resolve("station").resolve("0"), sbuf.array())
    // hour int64 0..3
    writeJson("hour/.zarray", meta(Seq(4), Seq(4), "<i8"))
    val hbuf = ByteBuffer.allocate(4 * 8).order(ByteOrder.LITTLE_ENDIAN)
    (0 until 4).foreach(h => hbuf.putLong(h.toLong))
    Files.write(root.resolve("hour").resolve("0"), hbuf.array())
    // reading[station, hour] = 100*station_idx + hour
    writeJson("reading/.zarray", meta(Seq(3, 4), Seq(1, 4), "<i8"))
    for (si <- 0 until 3) {
      val buf = ByteBuffer.allocate(4 * 8).order(ByteOrder.LITTLE_ENDIAN)
      (0 until 4).foreach(h => buf.putLong(100L * si + h))
      Files.write(root.resolve("reading").resolve(s"$si.0"), buf.array())
    }
    root
  }

  private def df = spark.read.format("zarr").load(store.toString)

  test("string coordinate surfaces as StringType with correct values") {
    assert(df.schema("station").dataType == org.apache.spark.sql.types.StringType)
    assert(df.count() == 12)
    val rows = df.orderBy("station", "hour").collect()
    assert(rows.map(_.getString(0)).distinct.toSeq == Seq("alp", "bern", "cgn"))
    // value grid intact through the string dimension
    rows.foreach { r =>
      val si = Seq("alp", "bern", "cgn").indexOf(r.getString(0))
      assert(r.getAs[Long]("reading") == 100L * si + r.getAs[Long]("hour"))
    }
  }

  test("string equality filter prunes to one station slab") {
    val f = df.filter(col("station") === "bern")
    assert(f.count() == 4)
    assert(f.collect().forall(_.getString(0) == "bern"))
    // pruning happened at plan time: candidate rows = 4 of 12
    val scan = f.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s.scan.description()
    }.head
    assert(scan.contains("rows=4"), scan)
    // absent station: provably empty, zero partitions
    assert(df.filter(col("station") === "nope").count() == 0)
  }

  private lazy val dtStore: Path = {
    val root = Files.createTempDirectory("zarr_dtcoord")
    def writeJson(rel: String, s2: String): Unit = {
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.write(p, s2.getBytes)
    }
    writeJson(".zgroup", """{"zarr_format":2}""")
    def meta(shape: Seq[Int], chunks: Seq[Int], dtype: String) =
      s"""{"zarr_format":2,"shape":[${shape.mkString(",")}],
          "chunks":[${chunks.mkString(",")}],"dtype":"$dtype","fill_value":0,
          "order":"C","filters":null,"dimension_separator":".","compressor":null}"""
    // time datetime64[h]: 3 hourly steps from 2020-01-01T00
    writeJson("time/.zarray", meta(Seq(3), Seq(3), "<M8[h]"))
    val base = java.time.Instant.parse("2020-01-01T00:00:00Z").getEpochSecond / 3600
    val tbuf = ByteBuffer.allocate(3 * 8).order(ByteOrder.LITTLE_ENDIAN)
    (0 until 3).foreach(h => tbuf.putLong(base + h))
    Files.write(root.resolve("time").resolve("0"), tbuf.array())
    writeJson("x/.zarray", meta(Seq(2), Seq(2), "<i8"))
    val xbuf = ByteBuffer.allocate(2 * 8).order(ByteOrder.LITTLE_ENDIAN)
    (0 until 2).foreach(x => xbuf.putLong(x.toLong))
    Files.write(root.resolve("x").resolve("0"), xbuf.array())
    writeJson("v/.zarray", meta(Seq(3, 2), Seq(1, 2), "<i8"))
    for (t <- 0 until 3) {
      val buf = ByteBuffer.allocate(2 * 8).order(ByteOrder.LITTLE_ENDIAN)
      (0 until 2).foreach(x => buf.putLong(10L * t + x))
      Files.write(root.resolve("v").resolve(s"$t.0"), buf.array())
    }
    root
  }

  test("datetime64 coordinate surfaces as TimestampType; timestamp filter prunes") {
    val d = spark.read.format("zarr").load(dtStore.toString)
    assert(d.schema("time").dataType == org.apache.spark.sql.types.TimestampType)
    assert(d.count() == 6)
    val one = d.filter(col("time") === lit("2020-01-01 01:00:00").cast("timestamp"))
    assert(one.count() == 2)
    assert(one.agg(sum("v")).collect().head.getLong(0) == 10L + 11L)
    // plan-time pruning to the one-hour slab (2 of 6 candidate rows)
    val scan = one.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s.scan.description()
    }.head
    assert(scan.contains("rows=2"), scan)
    // event-time functions work on the decoded values
    assert(d.select(hour(col("time"))).distinct().collect()
      .map(_.getInt(0)).sorted.toSeq == Seq(0, 1, 2))
  }

  test("fixed-width string DATA variable reads as StringType values") {
    // label[station, hour] |S6: NUL-padded codes; absent chunk -> ""
    val root = Files.createTempDirectory("zarr_strvar")
    def writeJson(rel: String, s2: String): Unit = {
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.write(p, s2.getBytes)
    }
    writeJson(".zgroup", """{"zarr_format":2}""")
    def meta(shape: Seq[Int], chunks: Seq[Int], dtype: String, fill: String = "0") =
      s"""{"zarr_format":2,"shape":[${shape.mkString(",")}],
          "chunks":[${chunks.mkString(",")}],"dtype":"$dtype","fill_value":$fill,
          "order":"C","filters":null,"dimension_separator":".","compressor":null}"""
    // equal-length dims order alphabetically-last first: y = dim0
    writeJson("y/.zarray", meta(Seq(2), Seq(2), "<i8"))
    val ibuf = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    ibuf.putLong(0L); ibuf.putLong(1L)
    Files.write(root.resolve("y").resolve("0"), ibuf.array())
    writeJson("x/.zarray", meta(Seq(2), Seq(2), "<i8"))
    Files.write(root.resolve("x").resolve("0"), ibuf.array())
    writeJson("label/.zarray", meta(Seq(2, 2), Seq(1, 2), "|S6", "null"))
    val lbuf = ByteBuffer.allocate(12)
    Seq("ok", "warn").foreach { v =>
      lbuf.put(java.util.Arrays.copyOf(v.getBytes("US-ASCII"), 6))
    }
    Files.write(root.resolve("label").resolve("0.0"), lbuf.array())
    // chunk 1.0 absent -> fill ""
    val d = spark.read.format("zarr").load(root.toString)
    assert(d.columns.toSeq == Seq("y", "x", "label"))
    assert(d.schema("label").dataType == org.apache.spark.sql.types.StringType)
    val rows = d.orderBy("y", "x").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(rows == Seq((0L, 0L, "ok"), (0L, 1L, "warn"), (1L, 0L, ""), (1L, 1L, "")))
    // filters evaluate post-scan on the string var
    assert(d.filter(col("label") === "warn").count() == 1)
  }

  test("numeric pruning still applies on the numeric dim; min/max agg not metadata-answered for strings") {
    val f = df.filter(col("hour") >= 2 && col("station") === "cgn")
    assert(f.count() == 2)
    assert(f.agg(sum("reading")).collect().head.getLong(0) == (202L + 203L))
    // MIN(station) must come from a real scan (no index-double leak)
    assert(df.agg(min("station")).collect().head.getString(0) == "alp")
  }
}
