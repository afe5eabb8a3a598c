package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.zarr.{ChunkCodec, HadoopStore, ZarrDType, ZarrWriter}

/** Regression coverage for the round-2 advisory findings: sink writes
  * routed through the storage abstraction (remote-capable, write-to-
  * temp-then-swap), decoded-chunk cache invalidation on rewrite,
  * string-coordinate truncation at chunk overhang, not-found vs
  * IO-error classification, and datetime64 floor conversion. */
class ZarrAdviceSpec extends AnyFunSuite {
  import TestSession._

  private val v3 = "src/test/resources/zarr/synthetic_v3.zarr"

  test("HadoopStore writeBytes/readBytes/moveTo/deleteRecursively round-trip") {
    val tmp = Files.createTempDirectory("zarr_hadoop")
    val store = HadoopStore(s"file:$tmp/store.zarr")
    store.writeBytes("a/.zarray", "{}".getBytes)
    store.writeBytes("a/0.0", Array[Byte](1, 2, 3))
    assert(store.readBytes("a/0.0").get.toSeq == Seq[Byte](1, 2, 3))
    assert(store.sizeOf("a/0.0").contains(3L))
    store.moveTo(s"file:$tmp/moved.zarr")
    val moved = HadoopStore(s"file:$tmp/moved.zarr")
    assert(moved.readBytes("a/0.0").get.toSeq == Seq[Byte](1, 2, 3))
    assert(!Files.exists(tmp.resolve("store.zarr")))
    moved.deleteRecursively()
    assert(!Files.exists(tmp.resolve("moved.zarr")))
    assert(moved.readBytes("a/0.0").isEmpty)
  }

  test("failed overwrite leaves the existing store intact (temp+swap)") {
    val out = Files.createTempDirectory("zarr_swap").resolve("s.zarr").toString
    val src = spark.read.format("zarr").load(v3)
    src.write.format("zarr").option("coords", "time,lon,lat")
      .mode("overwrite").save(out)
    val before = spark.read.format("zarr").load(out)
      .agg(sum("temperature")).collect().head.getLong(0)
    // duplicate rows violate the complete-grid contract -> write fails
    intercept[Exception] {
      src.union(src).write.format("zarr").option("coords", "time,lon,lat")
        .mode("overwrite").save(out)
    }
    // old store still present and readable; no temp dir left behind
    val after = spark.read.format("zarr").load(out)
      .agg(sum("temperature")).collect().head.getLong(0)
    assert(after == before)
    // failed write cleaned up its unique temp sibling
    val siblings = Files.list(Paths.get(out).getParent).toArray.map(_.toString)
    assert(!siblings.exists(_.contains("__graft_tmp")), siblings.mkString(","))
  }

  test("chunk cache does not serve stale data after an overwrite") {
    val out = Files.createTempDirectory("zarr_stale").resolve("c.zarr").toString
    val src = spark.read.format("zarr").load(v3)
      .select(col("time"), col("lon"), col("lat"), col("temperature"))
    ZarrWriter.write(src, out, coords = Seq("time", "lon", "lat"), chunkOuter = 2)
    def cached = spark.read.format("zarr")
      .option("chunkCacheEntries", "64").load(out)
    val first = cached.agg(sum("temperature")).collect().head.getLong(0)
    // rewrite the SAME path with shifted values
    ZarrWriter.write(
      src.withColumn("temperature", col("temperature") + 100),
      out, coords = Seq("time", "lon", "lat"), chunkOuter = 2)
    val second = cached.agg(sum("temperature")).collect().head.getLong(0)
    assert(second == first + 100L * 700L)
  }

  test("1-D string coordinate with chunk extent > shape truncates padding") {
    val root = Files.createTempDirectory("zarr_strtrunc")
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
    // station |S4: shape 3 but chunk extent 5 -> 2 cells of NUL padding
    writeJson("station/.zarray", meta(Seq(3), Seq(5), "|S4"))
    val sbuf = ByteBuffer.allocate(5 * 4)
    Seq("alp", "bern", "cgn").foreach(n =>
      sbuf.put(java.util.Arrays.copyOf(n.getBytes("US-ASCII"), 4)))
    Files.write(root.resolve("station").resolve("0"), sbuf.array())
    writeJson("hour/.zarray", meta(Seq(2), Seq(2), "<i8"))
    val hbuf = ByteBuffer.allocate(2 * 8).order(ByteOrder.LITTLE_ENDIAN)
    (0 until 2).foreach(h => hbuf.putLong(h.toLong))
    Files.write(root.resolve("hour").resolve("0"), hbuf.array())
    writeJson("reading/.zarray", meta(Seq(3, 2), Seq(1, 2), "<i8"))
    for (si <- 0 until 3) {
      val buf = ByteBuffer.allocate(2 * 8).order(ByteOrder.LITTLE_ENDIAN)
      (0 until 2).foreach(h => buf.putLong(100L * si + h))
      Files.write(root.resolve("reading").resolve(s"$si.0"), buf.array())
    }
    val d = spark.read.format("zarr").load(root.toString)
    assert(d.count() == 6) // 3 stations x 2 hours, NOT 5 x 2
    assert(d.select("station").distinct().collect().map(_.getString(0)).sorted.toSeq
      == Seq("alp", "bern", "cgn"))
  }

  test("reading a non-store directory fails clearly; IO errors are not misread as absent") {
    // empty dir: classified as "no store yet" (pending write), read errors
    val empty = Files.createTempDirectory("zarr_empty").toString
    val e = intercept[Exception](
      spark.read.format("zarr").load(empty).count())
    assert(e.getMessage != null)
    // HTTP server that 500s on everything: must surface an IO error,
    // not an empty-schema pending-write table
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      ex.sendResponseHeaders(500, -1); ex.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/store.zarr"
      val err = intercept[Exception](spark.read.format("zarr").load(url))
      def chain(t: Throwable): Seq[Throwable] =
        Seq(t) ++ Option(t.getCause).toSeq.flatMap(chain)
      assert(chain(err).exists(_.getMessage.contains("HTTP 500")), err.toString)
    } finally server.stop(0)
  }

  test("streaming foreachBatch can write a Zarr store (stream -> grid snapshot)") {
    // The sink is a complete-grid writer, so the streaming composition
    // is foreachBatch + overwrite: each micro-batch replaces the store
    // with the latest aggregated grid snapshot — the standard pattern
    // for non-append sinks (JDBC upserts, etc.).
    val src = spark.read.format("zarr").load(v3)
      .select("time", "lon", "lat", "temperature")
    val streamDir = Files.createTempDirectory("zarr_stream_in")
    src.coalesce(1).write.mode("overwrite").parquet(streamDir.toString)
    val out = Files.createTempDirectory("zarr_stream_out").resolve("s.zarr").toString
    val stream = spark.readStream.schema(src.schema).parquet(streamDir.toString)
    val q = stream.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.format("zarr")
          .option("coords", "time,lon,lat").option("chunkOuter", "2")
          .mode("overwrite").save(out)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val back = spark.read.format("zarr").load(out)
    assert(back.count() == 700)
    assert(back.agg(sum("temperature")).collect().head.getLong(0) ==
      src.agg(sum("temperature")).collect().head.getLong(0))
  }

  test("CTAS and INSERT OVERWRITE drive the sink from SQL") {
    val out = Files.createTempDirectory("zarr_ctas").resolve("t.zarr")
    spark.read.format("zarr").load(v3).createOrReplaceTempView("ctas_src")
    try {
      spark.sql(
        s"""CREATE TABLE zarr_ctas_t USING zarr
           OPTIONS (path '$out', coords 'time,lon,lat')
           AS SELECT * FROM ctas_src""")
      assert(Files.exists(out.resolve(".zgroup")))
      assert(spark.table("zarr_ctas_t").count() == 700)
      assert(spark.read.format("zarr").load(out.toString).count() == 700)
      val before = spark.table("zarr_ctas_t")
        .agg(sum("temperature")).collect().head.getLong(0)
      // INSERT OVERWRITE replaces the grid; coords come from the store
      spark.sql(
        """INSERT OVERWRITE TABLE zarr_ctas_t
           SELECT time, lon, lat, humidity, temperature + 1 AS temperature
           FROM ctas_src""")
      val after = spark.read.format("zarr").load(out.toString)
        .agg(sum("temperature")).collect().head.getLong(0)
      assert(after == before + 700)
      // plain INSERT INTO a complete grid is rejected
      val e = intercept[Exception](
        spark.sql("INSERT INTO zarr_ctas_t SELECT * FROM ctas_src"))
      def chain(t: Throwable): Seq[Throwable] =
        Seq(t) ++ Option(t.getCause).toSeq.flatMap(chain)
      assert(chain(e).exists(c => Option(c.getMessage)
        .exists(_.toLowerCase.contains("append"))), e.toString)
    } finally spark.sql("DROP TABLE IF EXISTS zarr_ctas_t")
  }

  test("blosc encoder round-trips through the parity-tested decoder") {
    val rnd = new scala.util.Random(7)
    // compressible: shuffled int64-ish pattern
    val comp = Array.tabulate(800)(i => (i / 8).toByte)
    val f1 = ChunkCodec.bloscCompress(comp, 8)
    assert(f1.length < comp.length, "compressible payload did not shrink")
    assert(ChunkCodec.bloscDecompress(f1).toSeq == comp.toSeq)
    // incompressible: random bytes take the stored-raw stream path
    val raw = Array.fill(256)(rnd.nextInt().toByte)
    val f2 = ChunkCodec.bloscCompress(raw, 8)
    assert(ChunkCodec.bloscDecompress(f2).toSeq == raw.toSeq)
    // header honors the public c-blosc layout the reader parses
    assert(f1(0) == 2 && f1(3) == 8)
    val nbytes = java.nio.ByteBuffer.wrap(f1).order(ByteOrder.LITTLE_ENDIAN).getInt(4)
    assert(nbytes == comp.length)
    // odd payload length: shuffle skipped, still round-trips
    val odd = Array.tabulate(33)(_.toByte)
    assert(ChunkCodec.bloscDecompress(ChunkCodec.bloscCompress(odd, 8)).toSeq == odd.toSeq)
  }

  test("string and datetime coordinates round-trip through the writer (v2)") {
    import org.apache.spark.sql.types.{StringType, TimestampType}
    val s = spark
    import s.implicits._
    // string coordinate: station x hour grid built in Spark
    val src = Seq(
      ("alp", 0L, 10L), ("alp", 1L, 11L),
      ("bern", 0L, 20L), ("bern", 1L, 21L),
      ("cgn", 0L, 30L), ("cgn", 1L, 31L))
      .toDF("station", "hour", "reading")
    val out = Files.createTempDirectory("zarr_strw").resolve("s.zarr").toString
    src.write.format("zarr").option("coords", "station,hour")
      .mode("overwrite").save(out)
    val back = spark.read.format("zarr").load(out)
    assert(back.schema("station").dataType == StringType)
    assert(back.orderBy("station", "hour").collect().map(_.toSeq).toSeq ==
      src.orderBy("station", "hour").collect().map(_.toSeq).toSeq)
    // string equality pushdown works on the written store
    assert(back.filter(col("station") === "bern").count() == 2)

    // datetime coordinate: hourly timestamps, written as <M8[us]
    val dt = Seq(0L, 3600L, 7200L).flatMap(sec => Seq(0L, 1L).map(x =>
      (new java.sql.Timestamp(sec * 1000), x, sec + x)))
      .toDF("time", "x", "v")
    val out2 = Files.createTempDirectory("zarr_dtw").resolve("d.zarr").toString
    dt.write.format("zarr").option("coords", "time,x")
      .mode("overwrite").save(out2)
    val back2 = spark.read.format("zarr").load(out2)
    assert(back2.schema("time").dataType == TimestampType)
    assert(back2.orderBy("time", "x").collect().map(_.toSeq).toSeq ==
      dt.orderBy("time", "x").collect().map(_.toSeq).toSeq)
    // v3 rejects with a clear message
    val e = intercept[Exception](
      src.write.format("zarr").option("coords", "station,hour")
        .option("zarrVersion", "3").mode("overwrite")
        .save(Files.createTempDirectory("zarr_strw").resolve("v3.zarr").toString))
    def chain(t: Throwable): Seq[Throwable] =
      Seq(t) ++ Option(t.getCause).toSeq.flatMap(chain)
    assert(chain(e).exists(c => Option(c.getMessage).exists(_.contains("zarrVersion=2"))))
  }

  test("OFFSET pushes into the scan and skips leading grid rows exactly") {
    val df = spark.read.format("zarr").load(v3)
      .select("time", "lon", "lat", "temperature")
    val all = df.collect().map(_.toSeq).toSeq // deterministic row-major order
    assert(df.offset(10).collect().map(_.toSeq).toSeq == all.drop(10))
    assert(df.offset(13).limit(5).collect().map(_.toSeq).toSeq ==
      all.slice(13, 18))
    // offset reached the scan (not a post-scan operator only)
    val scanDesc = df.offset(10).queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        s.scan.description()
    }.head
    assert(scanDesc.contains("offset=10"), scanDesc)
    // SQL LIMIT/OFFSET and filters compose
    assert(df.filter(col("time") === 3).offset(7).limit(3)
      .collect().map(_.toSeq).toSeq ==
      all.filter(_.head == 3L).slice(7, 10))
    assert(df.offset(700).collect().isEmpty)
  }

  test("unsupported v2 filters and unknown v3 codecs error instead of mis-decoding") {
    // v2 store with a quantize filter (not implemented): must refuse loudly
    val root = Files.createTempDirectory("zarr_filters")
    Files.write(root.resolve(".zgroup"), """{"zarr_format":2}""".getBytes)
    val dir = root.resolve("x"); Files.createDirectories(dir)
    Files.write(dir.resolve(".zarray"),
      """{"zarr_format":2,"shape":[4],"chunks":[4],"dtype":"<f8","fill_value":0,
         "order":"C","filters":[{"id":"quantize","digits":2}],"compressor":null}""".getBytes)
    Files.write(dir.resolve("0"), new Array[Byte](32))
    val e = intercept[Exception](spark.read.format("zarr").load(root.toString).count())
    def chain(t: Throwable): Seq[Throwable] =
      Seq(t) ++ Option(t.getCause).toSeq.flatMap(chain)
    assert(chain(e).exists(c => Option(c.getMessage).exists(_.contains("quantize"))), e.toString)

    // delta on a non-numeric dtype: refused at parse time
    val rootS = Files.createTempDirectory("zarr_filters_s")
    Files.write(rootS.resolve(".zgroup"), """{"zarr_format":2}""".getBytes)
    val dirS = rootS.resolve("s"); Files.createDirectories(dirS)
    Files.write(dirS.resolve(".zarray"),
      """{"zarr_format":2,"shape":[4],"chunks":[4],"dtype":"|S4","fill_value":0,
         "order":"C","filters":[{"id":"delta","dtype":"|S4"}],"compressor":null}""".getBytes)
    Files.write(dirS.resolve("0"), new Array[Byte](16))
    val eS = intercept[Exception](spark.read.format("zarr").load(rootS.toString).count())
    assert(chain(eS).exists(c => Option(c.getMessage).exists(_.contains("delta"))), eS.toString)

    // v3 array with a transpose codec: must refuse loudly
    val root3 = Files.createTempDirectory("zarr_codecs3")
    Files.write(root3.resolve("zarr.json"),
      """{"zarr_format":3,"node_type":"group"}""".getBytes)
    val d3 = root3.resolve("y"); Files.createDirectories(d3)
    Files.write(d3.resolve("zarr.json"),
      """{"zarr_format":3,"node_type":"array","shape":[4],"data_type":"int64",
         "chunk_grid":{"name":"regular","configuration":{"chunk_shape":[4]}},
         "chunk_key_encoding":{"name":"default","configuration":{"separator":"/"}},
         "fill_value":0,
         "codecs":[{"name":"transpose","configuration":{"order":[0]}},
                   {"name":"bytes","configuration":{"endian":"little"}}]}""".getBytes)
    val e3 = intercept[Exception](spark.read.format("zarr").load(root3.toString).count())
    assert(chain(e3).exists(c => Option(c.getMessage).exists(_.contains("transpose"))), e3.toString)
  }

  test("v2 delta filter decodes per chunk (numcodecs cumulative sum)") {
    // time: int64 coord, 2 delta-encoded chunks; m[time,y]: float64 data
    // var, delta over the flattened C-order chunk (numcodecs semantics).
    val root = Files.createTempDirectory("zarr_delta")
    Files.write(root.resolve(".zgroup"), """{"zarr_format":2}""".getBytes)
    def meta(shape: String, chunks: String, dtype: String) =
      s"""{"zarr_format":2,"shape":[$shape],"chunks":[$chunks],"dtype":"$dtype",
          "fill_value":-1,"order":"C","filters":[{"id":"delta","dtype":"$dtype"}],
          "compressor":null}"""
    def put(rel: String, longs: Seq[Long] = Nil, doubles: Seq[Double] = Nil): Unit = {
      val p = root.resolve(rel); Files.createDirectories(p.getParent)
      val buf = ByteBuffer.allocate((longs.length + doubles.length) * 8)
        .order(ByteOrder.LITTLE_ENDIAN)
      longs.foreach(buf.putLong); doubles.foreach(buf.putDouble)
      Files.write(p, buf.array())
    }
    Files.createDirectories(root.resolve("time"))
    Files.write(root.resolve("time/.zarray"), meta("6", "3", "<i8").getBytes)
    put("time/0", longs = Seq(10L, 3L, 4L))  // → 10, 13, 17
    put("time/1", longs = Seq(20L, 4L, 5L))  // → 20, 24, 29
    Files.createDirectories(root.resolve("y"))
    Files.write(root.resolve("y/.zarray"),
      """{"zarr_format":2,"shape":[2],"chunks":[2],"dtype":"<i8","fill_value":-1,
         "order":"C","filters":null,"compressor":null}""".getBytes)
    put("y/0", longs = Seq(0L, 1L))
    Files.createDirectories(root.resolve("m"))
    Files.write(root.resolve("m/.zarray"), meta("6,2", "3,2", "<f8").getBytes)
    put("m/0.0", doubles = Seq(1.0, 1, 1, 1, 1, 1))  // → 1..6
    put("m/1.0", doubles = Seq(7.0, 1, 1, 1, 1, 1))  // → 7..12
    val rows = spark.read.format("zarr").load(root.toString)
      .orderBy("time", "y").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val times = Seq(10L, 13L, 17L, 20L, 24L, 29L)
    val expected = for (t <- 0 until 6; y <- 0 until 2)
      yield (times(t), y.toLong, (t * 2 + y + 1).toDouble)
    assert(rows == expected)
  }

  test("datetime64 conversion floors toward negative infinity and rejects overflow") {
    val ns = ZarrDType.parseV2("<M8[ns]")
    def dec(dtype: ZarrDType, vs: Long*): Seq[Long] = {
      val buf = ByteBuffer.allocate(vs.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      vs.foreach(buf.putLong)
      ChunkCodec.decodeTyped(buf.array(), dtype, vs.length)
        .asInstanceOf[Array[Long]].toSeq
    }
    // pre-epoch ns values floor (numpy/Spark semantics), not round to zero
    assert(dec(ns, -1500L, -1000L, -999L, 1500L) == Seq(-2L, -1L, -1L, 1L))
    // day-resolution overflow fails loudly instead of wrapping
    val day = ZarrDType.parseV2("<M8[D]")
    assert(dec(day, 2L) == Seq(2L * 86400000000L))
    intercept[ArithmeticException](dec(day, Long.MaxValue / 86400000000L + 1))
  }
}
