package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.sources.zarr.ChunkIO
import org.scalatest.funsuite.AnyFunSuite

/** Generality probes for the Zarr connector beyond the committed
  * fixtures: float64 coordinates (epsilon filter matching), multi-chunk
  * dimensions, absent chunks (fill_value semantics), and partition-
  * count control. The store is written by the test itself. */
class ZarrEdgeSpec extends AnyFunSuite {
  import TestSession._

  private lazy val store: String = {
    val base = Files.createTempDirectory("probe_zarr").toString
    def writeJson(rel: String, s: String): Unit = {
      val p = Paths.get(base, rel)
      Files.createDirectories(p.getParent)
      Files.write(p, s.getBytes)
    }
    def writeChunk(rel: String, doubles: Seq[Double], asLong: Boolean = false): Unit = {
      val buf = ByteBuffer.allocate(doubles.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      if (asLong) doubles.foreach(d => buf.putLong(d.toLong))
      else doubles.foreach(buf.putDouble)
      Files.write(Paths.get(base, rel), buf.array())
    }
    writeJson(".zgroup", """{"zarr_format":2}""")
    def zmeta(shape: Seq[Int], chunks: Seq[Int], dtype: String) =
      s"""{"zarr_format":2,"shape":[${shape.mkString(",")}],
          "chunks":[${chunks.mkString(",")}],"dtype":"$dtype","fill_value":-1,
          "order":"C","filters":null,"dimension_separator":".","compressor":null}"""
    // depth: float64 coord, 2 chunks; x: int64 coord
    writeJson("depth/.zarray", zmeta(Seq(4), Seq(2), "<f8"))
    writeChunk("depth/0", Seq(1.5, 2.5)); writeChunk("depth/1", Seq(3.5, 4.5))
    writeJson("x/.zarray", zmeta(Seq(6), Seq(6), "<i8"))
    writeChunk("x/0", (0 until 6).map(_.toDouble), asLong = true)
    // measurement[depth, x]: 4x6, chunks (2,3); chunk 1.1 ABSENT -> fill -1
    writeJson("measurement/.zarray", zmeta(Seq(4, 6), Seq(2, 3), "<f8"))
    def cells(d0: Int, x0: Int): Seq[Double] =
      for (d <- d0 until d0 + 2; x <- x0 until x0 + 3) yield (d * 100 + x).toDouble
    writeChunk("measurement/0.0", cells(0, 0))
    writeChunk("measurement/0.1", cells(0, 3))
    writeChunk("measurement/1.0", cells(2, 0))
    base
  }

  private def df = spark.read.format("zarr").load(store)

  test("schema: float coord + int coord + float var; 24 rows") {
    assert(df.schema.simpleString ==
      "struct<depth:double,x:bigint,measurement:double>")
    assert(df.count() == 24)
  }

  test("values correct across chunk boundaries") {
    val m = df.filter(col("depth") === 3.5 && col("x") === 2).collect()
    assert(m.length == 1 && m.head.getAs[Double]("measurement") == 202.0)
  }

  test("absent chunk yields fill_value") {
    val m = df.filter(col("depth") === 4.5 && col("x") === 5).collect()
    assert(m.length == 1 && m.head.getAs[Double]("measurement") == -1.0)
  }

  test("float coordinate equality filter prunes and matches") {
    val f = df.filter(col("depth") === 2.5)
    assert(f.count() == 6)
    assert(f.select("measurement").collect().map(_.getDouble(0)).sorted.toSeq ==
      Seq(100.0, 101.0, 102.0, 103.0, 104.0, 105.0))
  }

  test("inner-dimension chunks decode once per band, not once per grid row") {
    // measurement is 4x6 in (2,3) chunks: the row-major walk revisits
    // each inner chunk twice per outer band; without the band cache
    // that's 8 decodes, with it exactly one per chunk position (4,
    // including the absent 1.1 synthesized as fill).
    val frame = df // readStore here: coordinate decodes land before the measurement
    val q = frame.agg(sum("measurement"))
    val before = ChunkIO.decodeCount.get()
    q.collect()
    val decoded = ChunkIO.decodeCount.get() - before
    assert(decoded == 4, s"expected 4 chunk decodes, got $decoded")
  }

  test("prefetch returns identical data and still decodes each chunk once") {
    val pf = spark.read.format("zarr").option("prefetch", "true").load(store)
    val q = pf.agg(sum("measurement"))
    val before = ChunkIO.decodeCount.get()
    val withPf = q.collect().head.getDouble(0)
    val decoded = ChunkIO.decodeCount.get() - before
    // one-ahead prediction follows the exact miss order, so prefetch
    // adds zero wasted decodes
    assert(decoded == 4, s"expected 4 chunk decodes with prefetch, got $decoded")
    assert(withPf == df.agg(sum("measurement")).collect().head.getDouble(0))
    assert(pf.orderBy("depth", "x").collect().map(_.toSeq).toSeq ==
      df.orderBy("depth", "x").collect().map(_.toSeq).toSeq)
  }

  test("partition count follows outer chunks when minRowsPerPartition is small") {
    val p = spark.read.format("zarr").option("minRowsPerPartition", "1").load(store)
    assert(p.rdd.getNumPartitions == 2) // outer dim 4, chunk 2
    assert(p.count() == 24)
  }
}

/** Consolidated-metadata (.zmetadata) stores resolve schema with a
  * single metadata fetch; the walk is skipped entirely. */
class ZarrConsolidatedSpec extends org.scalatest.funsuite.AnyFunSuite {
  import TestSession._
  import java.nio.file.{Files, Paths, StandardCopyOption}

  private lazy val store: String = {
    val src = Paths.get("src/test/resources/zarr/synthetic_v2.zarr")
    val dst = Files.createTempDirectory("consolidated_zarr")
    Files.walk(src).forEach { p =>
      val t = dst.resolve(src.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
    }
    // consolidate: embed every .zarray into one .zmetadata, but omit
    // `humidity` — proving inference uses the consolidated doc, not a walk
    val names = Seq("lat", "lon", "time", "temperature")
    val entries = names.map { n =>
      val z = new String(Files.readAllBytes(dst.resolve(n).resolve(".zarray")))
      s""""$n/.zarray": $z"""
    }.mkString(",")
    Files.write(dst.resolve(".zmetadata"),
      s"""{"zarr_consolidated_format": 1, "metadata": {$entries}}""".getBytes)
    dst.toString
  }

  test("schema comes from .zmetadata (omitted array invisible)") {
    val df = spark.read.format("zarr").load(store)
    assert(df.columns.toSeq == Seq("time", "lon", "lat", "temperature"))
    assert(df.count() == 700)
  }

  test("data identical to the walked store") {
    val cons = spark.read.format("zarr").load(store)
      .select("time", "lon", "lat", "temperature")
      .orderBy("time", "lon", "lat").collect().map(_.toSeq).toSeq
    val walked = spark.read.format("zarr")
      .load("src/test/resources/zarr/synthetic_v2.zarr")
      .select("time", "lon", "lat", "temperature")
      .orderBy("time", "lon", "lat").collect().map(_.toSeq).toSeq
    assert(cons == walked)
  }
}

/** End-to-end store exercising the widened dtypes (uint16, float32,
  * bool) through the full format("zarr") read path. */
class ZarrMixedDTypeSpec extends org.scalatest.funsuite.AnyFunSuite {
  import TestSession._
  import java.nio.{ByteBuffer, ByteOrder}
  import java.nio.file.{Files, Paths}

  private lazy val store: String = {
    val base = Files.createTempDirectory("mixed_zarr").toString
    def w(rel: String, bytes: Array[Byte]): Unit = {
      val p = Paths.get(base, rel)
      Files.createDirectories(p.getParent)
      Files.write(p, bytes)
    }
    def meta(shape: Seq[Int], chunks: Seq[Int], dtype: String) =
      s"""{"zarr_format":2,"shape":[${shape.mkString(",")}],
          "chunks":[${chunks.mkString(",")}],"dtype":"$dtype","fill_value":0,
          "order":"C","filters":null,"dimension_separator":".","compressor":null}""".getBytes
    w(".zgroup", """{"zarr_format":2}""".getBytes)
    w("k/.zarray", meta(Seq(4), Seq(4), "<i4"))
    w("k/0", { val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      (0 until 4).foreach(b.putInt); b.array() })
    // u2 data: values near the unsigned max
    w("counts/.zarray", meta(Seq(4), Seq(4), "<u2")) // 1-D -> coordinate! use 2-D
    // overwrite as 2-D with a second coord
    w("j/.zarray", meta(Seq(2), Seq(2), "<i4"))
    w("j/0", { val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      (0 until 2).foreach(b.putInt); b.array() })
    w("counts/.zarray", meta(Seq(4, 2), Seq(4, 2), "<u2"))
    w("counts/0.0", { val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      Seq(65535, 65534, 1, 2, 3, 4, 5, 6).foreach(v => b.putShort(v.toShort)); b.array() })
    w("ratio/.zarray", meta(Seq(4, 2), Seq(4, 2), "<f4"))
    w("ratio/0.0", { val b = ByteBuffer.allocate(32).order(ByteOrder.LITTLE_ENDIAN)
      (0 until 8).foreach(i => b.putFloat(i * 0.5f)); b.array() })
    w("flag/.zarray", meta(Seq(4, 2), Seq(4, 2), "|b1"))
    w("flag/0.0", Array[Byte](1, 0, 0, 1, 1, 0, 1, 0))
    base
  }

  test("widened types arrive with full value space") {
    val df = spark.read.format("zarr").load(store)
    assert(df.schema.simpleString ==
      "struct<k:int,j:int,counts:int,flag:boolean,ratio:float>")
    val rows = df.orderBy("k", "j").collect()
    assert(rows.length == 8)
    assert(rows(0).getAs[Int]("counts") == 65535) // u2 max survives widening
    assert(rows(1).getAs[Int]("counts") == 65534)
    assert(rows(3).getAs[Float]("ratio") == 1.5f)
    assert(rows(0).getAs[Boolean]("flag") && !rows(1).getAs[Boolean]("flag"))
  }

  test("aggregates over widened types") {
    val df = spark.read.format("zarr").load(store)
    val r = df.agg(
      org.apache.spark.sql.functions.sum("counts"),
      org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col("flag"), 1))).collect().head
    assert(r.getLong(0) == 65535L + 65534 + 1 + 2 + 3 + 4 + 5 + 6)
    assert(r.getLong(1) == 4)
  }

  test("xarray _ARRAY_DIMENSIONS beats size inference on an external square store") {
    // 3x3 square grid: size inference is ambiguous (reverse-alpha
    // tie-break would pick zeta first); the store carries xarray's
    // explicit dimension names declaring (alpha, zeta) — explicit wins.
    val base = Files.createTempDirectory("xr_square").toString
    def wj(rel: String, s: String): Unit = {
      val p = Paths.get(base, rel)
      Files.createDirectories(p.getParent)
      Files.write(p, s.getBytes)
    }
    def wl(rel: String, vals: Seq[Long]): Unit = {
      val buf = ByteBuffer.allocate(vals.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      vals.foreach(buf.putLong)
      Files.write(Paths.get(base, rel), buf.array())
    }
    wj(".zgroup", """{"zarr_format":2}""")
    def zm(shape: Seq[Int], chunks: Seq[Int]) =
      s"""{"zarr_format":2,"shape":[${shape.mkString(",")}],
          "chunks":[${chunks.mkString(",")}],"dtype":"<i8","fill_value":0,
          "order":"C","filters":null,"dimension_separator":".","compressor":null}"""
    wj("alpha/.zarray", zm(Seq(3), Seq(3))); wl("alpha/0", Seq(0L, 1L, 2L))
    wj("zeta/.zarray", zm(Seq(3), Seq(3))); wl("zeta/0", Seq(0L, 1L, 2L))
    wj("val/.zarray", zm(Seq(3, 3), Seq(3, 3)))
    wj("val/.zattrs", """{"_ARRAY_DIMENSIONS": ["alpha", "zeta"]}""")
    // C-order alpha-major payload: val(a, z) = a*10 + z
    wl("val/0.0", for (a <- 0L until 3L; z <- 0L until 3L) yield a * 10 + z)
    val df = spark.read.format("zarr").load(base)
    assert(df.columns.toSeq == Seq("alpha", "zeta", "val"))
    // attribute is plumbing: hidden from column metadata
    assert(!df.schema("val").metadata.contains("_ARRAY_DIMENSIONS"))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = (for (a <- 0L until 3L; z <- 0L until 3L) yield (a, z, a * 10 + z)).toSet
    assert(got == want)
  }

  test("a corrupt chunk fails naming the chunk and store, not a bare codec error") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("zarr_trunc")
      .resolve("s.zarr").toString
    Seq((0L, 0L, 1.0), (0L, 1L, 2.0), (1L, 0L, 3.0), (1L, 1L, 4.0))
      .toDF("t", "x", "v")
      .write.format("zarr").option("coords", "t,x").option("chunkOuter", "1")
      .mode("overwrite").save(out)
    val chunk = java.nio.file.Files.list(java.nio.file.Paths.get(out, "v"))
      .filter(p => !p.getFileName.toString.startsWith(".")).findFirst.get
    java.nio.file.Files.write(chunk, Array[Byte](1, 2, 3))
    val e = intercept[Exception] { spark.read.format("zarr").load(out).collect() }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).getOrElse("") +: chain(t.getCause)
    assert(chain(e).exists(m =>
      m.contains("corrupt or unreadable chunk") && m.contains("v/")),
      chain(e).mkString("\n"))
  }
}
