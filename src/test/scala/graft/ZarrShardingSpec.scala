package graft

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path}
import java.util.zip.{CRC32C, GZIPOutputStream}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Zarr v3 `sharding_indexed` read support, verified against a store
  * constructed byte-by-byte from the spec: C-order inner-chunk grid,
  * `(offset, nbytes) uint64le` index with crc32c at the shard end,
  * missing inner chunks (2^64-1 sentinels) → fill_value, gzip inner
  * codec chain. Grid: x(6) × y(4), v[x,y] = 10x + y, shards of (2,4)
  * with inner chunks (1,2).
  */
class ZarrShardingSpec extends AnyFunSuite {
  import TestSession._

  private def le(longs: Long*): Array[Byte] = {
    val b = ByteBuffer.allocate(longs.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    longs.foreach(b.putLong)
    b.array()
  }

  private def gzip(data: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos)
    g.write(data); g.close()
    bos.toByteArray
  }

  private def coordJson(n: Int): String =
    s"""{"zarr_format":3,"node_type":"array","shape":[$n],
       |"data_type":"int64","chunk_grid":{"name":"regular","configuration":{"chunk_shape":[$n]}},
       |"chunk_key_encoding":{"name":"default","configuration":{"separator":"/"}},
       |"fill_value":0,"codecs":[{"name":"bytes","configuration":{"endian":"little"}}]}"""
      .stripMargin.replace("\n", "")

  private def shardedJson(innerCodecs: String): String =
    s"""{"zarr_format":3,"node_type":"array","shape":[6,4],
       |"data_type":"int64","chunk_grid":{"name":"regular","configuration":{"chunk_shape":[2,4]}},
       |"chunk_key_encoding":{"name":"default","configuration":{"separator":"/"}},
       |"fill_value":99,"codecs":[{"name":"sharding_indexed","configuration":{
       |"chunk_shape":[1,2],
       |"codecs":[$innerCodecs],
       |"index_codecs":[{"name":"bytes","configuration":{"endian":"little"}},{"name":"crc32c"}],
       |"index_location":"end"}}]}""".stripMargin.replace("\n", "")

  /** Build one shard file: inner chunks for (sx∈{0,1})×(sy∈{0,1}) in
    * C-order; `skip` marks missing inner chunks. */
  private def shard(shardX: Int, encode: Array[Byte] => Array[Byte],
      skip: Set[Int] = Set.empty): Array[Byte] = {
    val body = new ByteArrayOutputStream()
    val index = ByteBuffer.allocate(4 * 16).order(ByteOrder.LITTLE_ENDIAN)
    var ci = 0
    for (sx <- 0 until 2; sy <- 0 until 2) {
      if (skip(ci)) { index.putLong(-1L); index.putLong(-1L) }
      else {
        val x = shardX * 2 + sx
        val enc = encode(le(10L * x + 2 * sy, 10L * x + 2 * sy + 1))
        index.putLong(body.size().toLong); index.putLong(enc.length.toLong)
        body.write(enc)
      }
      ci += 1
    }
    val crc = new CRC32C
    crc.update(index.array())
    val tail = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(crc.getValue.toInt).array()
    body.write(index.array()); body.write(tail)
    body.toByteArray
  }

  private def buildStore(innerCodecs: String, encode: Array[Byte] => Array[Byte],
      skipInShard1: Set[Int]): Path = {
    val root = Files.createTempDirectory("zarr_shard")
    Files.write(root.resolve("zarr.json"),
      """{"zarr_format":3,"node_type":"group"}""".getBytes)
    for ((name, n) <- Seq(("x", 6), ("y", 4))) {
      val d = root.resolve(name); Files.createDirectories(d.resolve("c"))
      Files.write(d.resolve("zarr.json"), coordJson(n).getBytes)
      Files.write(d.resolve("c").resolve("0"), le((0L until n).map(_ * 1L): _*))
    }
    val v = root.resolve("v")
    Files.createDirectories(v.resolve("c").resolve("0"))
    Files.createDirectories(v.resolve("c").resolve("1"))
    Files.createDirectories(v.resolve("c").resolve("2"))
    Files.write(v.resolve("zarr.json"), shardedJson(innerCodecs).getBytes)
    Files.write(v.resolve("c").resolve("0").resolve("0"), shard(0, encode))
    Files.write(v.resolve("c").resolve("1").resolve("0"), shard(1, encode, skipInShard1))
    Files.write(v.resolve("c").resolve("2").resolve("0"), shard(2, encode))
    root
  }

  test("sharded store decodes: values, missing inner chunk -> fill, full scan") {
    val root = buildStore(
      """{"name":"bytes","configuration":{"endian":"little"}}""",
      identity, skipInShard1 = Set(1)) // inner chunk (sx=0, sy=1) of shard 1 missing
    val df = spark.read.format("zarr").load(root.toString)
    assert(df.count() == 24)
    val rows = df.orderBy("x", "y").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // missing inner chunk covers x=2, y∈{2,3} -> fill 99
    rows.foreach { case (x, y, v) =>
      val expect = if (x == 2 && (y == 2 || y == 3)) 99L else 10 * x + y
      assert(v == expect, s"at ($x,$y)")
    }
  }

  test("sharded store with gzip inner codec decodes identically") {
    val root = buildStore(
      """{"name":"bytes","configuration":{"endian":"little"}},{"name":"gzip","configuration":{"level":5}}""",
      gzip, skipInShard1 = Set.empty)
    val df = spark.read.format("zarr").load(root.toString)
    assert(df.count() == 24)
    assert(df.agg(sum("v")).collect().head.getLong(0) ==
      (for (x <- 0 until 6; y <- 0 until 4) yield 10L * x + y).sum)
  }

  test("corrupt shard index crc fails loudly") {
    val root = buildStore(
      """{"name":"bytes","configuration":{"endian":"little"}}""",
      identity, skipInShard1 = Set.empty)
    val f = root.resolve("v").resolve("c").resolve("0").resolve("0")
    val bytes = Files.readAllBytes(f)
    bytes(bytes.length - 1) = (bytes(bytes.length - 1) ^ 0x5a).toByte
    Files.write(f, bytes)
    val ex = intercept[Exception] {
      spark.read.format("zarr").load(root.toString).collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: chain(t.getCause)
    assert(chain(ex).exists(m => m != null && m.contains("crc32c")))
  }

  test("sharded WRITE round-trips through the sharded reader") {
    val out = Files.createTempDirectory("zarr_shard_w").resolve("sw.zarr").toString
    val src = TestSession.spark.read.format("zarr")
      .load("src/test/resources/zarr/synthetic_v3.zarr")
    src.write.format("zarr")
      .option("coords", "time,lon,lat").option("chunkOuter", "4")
      .option("zarrVersion", "3").option("shardInner", "2")
      .mode("overwrite").save(out)
    // 7 time steps / chunkOuter 4 -> 2 shards, each 2 inner chunks
    assert(Files.exists(java.nio.file.Paths.get(out, "temperature", "c", "1", "0", "0")))
    val back = TestSession.spark.read.format("zarr").load(out)
    assert(back.schema == src.schema)
    val a = src.orderBy("time", "lon", "lat").collect().map(_.toSeq).toSeq
    val b = back.orderBy("time", "lon", "lat").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("compressed sharded WRITE (gzip inner codec) round-trips") {
    val out = Files.createTempDirectory("zarr_shard_gz").resolve("sgz.zarr").toString
    val src = TestSession.spark.read.format("zarr")
      .load("src/test/resources/zarr/synthetic_v3.zarr")
    src.write.format("zarr")
      .option("coords", "time,lon,lat").option("chunkOuter", "4")
      .option("zarrVersion", "3").option("shardInner", "2")
      .option("shardCompress", "true")
      .mode("overwrite").save(out)
    val metaJson = new String(Files.readAllBytes(
      java.nio.file.Paths.get(out, "temperature", "zarr.json")))
    assert(metaJson.contains("\"gzip\""), metaJson)
    val back = TestSession.spark.read.format("zarr").load(out)
    val a = src.orderBy("time", "lon", "lat").collect().map(_.toSeq).toSeq
    val b = back.orderBy("time", "lon", "lat").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("zstd and blosc shard inner codecs round-trip") {
    val src = TestSession.spark.read.format("zarr")
      .load("src/test/resources/zarr/synthetic_v3.zarr")
    for (codec <- Seq("zstd", "blosc")) {
      val out = Files.createTempDirectory(s"zarr_shard_$codec").resolve("s.zarr").toString
      src.write.format("zarr")
        .option("coords", "time,lon,lat").option("chunkOuter", "4")
        .option("zarrVersion", "3").option("shardInner", "2")
        .option("shardCompress", codec)
        .mode("overwrite").save(out)
      val metaJson = new String(Files.readAllBytes(
        java.nio.file.Paths.get(out, "temperature", "zarr.json")))
      assert(metaJson.contains(s""""$codec""""), metaJson)
      val back = TestSession.spark.read.format("zarr").load(out)
      val a = src.orderBy("time", "lon", "lat").collect().map(_.toSeq).toSeq
      val b = back.orderBy("time", "lon", "lat").collect().map(_.toSeq).toSeq
      assert(a == b, s"shardCompress=$codec round-trip mismatch")
    }
    // unknown inner codec is an early, clear error
    intercept[Exception](
      src.write.format("zarr")
        .option("coords", "time,lon,lat").option("zarrVersion", "3")
        .option("shardInner", "2").option("chunkOuter", "4")
        .option("shardCompress", "lzma").mode("overwrite")
        .save(Files.createTempDirectory("zarr_shard_bad").resolve("b.zarr").toString))
  }

  test("filter pushdown composes with sharded reads") {
    val root = buildStore(
      """{"name":"bytes","configuration":{"endian":"little"}}""",
      identity, skipInShard1 = Set.empty)
    val df = spark.read.format("zarr").load(root.toString)
      .filter(col("x") >= 2 && col("x") <= 3)
    assert(df.count() == 8)
    assert(df.agg(sum("v")).collect().head.getLong(0) ==
      (for (x <- 2 to 3; y <- 0 until 4) yield 10L * x + y).sum)
  }
}
