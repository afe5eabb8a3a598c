package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property round-trips for the Zarr sink: random grid shapes, chunk
  * sizes, dtypes, compressors and zarr versions must all write → read
  * back value-identical. This is the randomized counterpart of
  * ZarrWriterSpec's fixed cases — grid-edge arithmetic (partial edge
  * chunks, single-row dims, chunk size > dim) is where hand-picked
  * fixtures miss. */
class ZarrWriterPropSpec extends AnyFunSuite {
  import TestSession._

  private val genCase = for {
    nOuter <- Gen.choose(1, 9)
    nInner <- Gen.choose(1, 7)
    chunkOuter <- Gen.choose(1, 11) // may exceed nOuter: edge case
    version <- Gen.oneOf("2", "3")
    compressor <- Gen.oneOf("none", "zstd", "gzip", "blosc")
    dtype <- Gen.oneOf("long", "double")
  } yield (nOuter, nInner, chunkOuter, version, compressor, dtype)

  test("random grids round-trip through the sink at every version/compressor") {
    val prop = Prop.forAll(genCase) {
      case (nOuter, nInner, chunkOuter, version, compressor, dtype) =>
        val rows = for (o <- 0 until nOuter; i <- 0 until nInner) yield
          Row(o.toLong, i.toLong, (o * 31 + i * 7).toLong)
        val schema = StructType(Seq(
          StructField("t", LongType, nullable = false),
          StructField("x", LongType, nullable = false),
          StructField("v", LongType, nullable = true)))
        var df = spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 2), schema)
        if (dtype == "double") df = df.withColumn("v", col("v").cast("double") / 4.0)
        val out = Files.createTempDirectory("zarr_prop").resolve("g.zarr").toString
        df.write.format("zarr")
          .option("coords", "t,x")
          .option("chunkOuter", chunkOuter.toString)
          .option("zarrVersion", version)
          .option("compressor", compressor)
          .mode("overwrite").save(out)
        val back = spark.read.format("zarr").load(out)
        val a = df.orderBy("t", "x").collect().map(_.toSeq).toSeq
        val b = back.orderBy("t", "x").collect().map(_.toSeq).toSeq
        Prop(a == b) :|
          s"shape=($nOuter,$nInner) chunk=$chunkOuter v$version $compressor $dtype"
    }
    // Each case runs two Spark jobs; 24 random cases keeps the suite fast
    // while sweeping the edge-chunk space.
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(24), prop)
    assert(res.passed, res.status.toString)
  }

  private val genAppend = for {
    chunkOuter <- Gen.choose(1, 4)
    nChunksA <- Gen.choose(1, 4) // first write: whole chunks
    nChunksB <- Gen.choose(1, 3) // appended: whole chunks
    nInner <- Gen.choose(1, 6)
    version <- Gen.oneOf("2", "3")
  } yield (chunkOuter, nChunksA, nChunksB, nInner, version)

  test("random outer-append splits equal the one-shot write") {
    val prop = Prop.forAll(genAppend) {
      case (chunkOuter, nChunksA, nChunksB, nInner, version) =>
        val nA = chunkOuter * nChunksA
        val nTotal = nA + chunkOuter * nChunksB
        def grid(lo: Int, hi: Int) = {
          val rows = for (o <- lo until hi; i <- 0 until nInner) yield
            Row(o.toLong, i.toLong, (o * 17 + i * 3).toLong)
          spark.createDataFrame(
            spark.sparkContext.parallelize(rows, 2),
            StructType(Seq(
              StructField("t", LongType, nullable = false),
              StructField("x", LongType, nullable = false),
              StructField("v", LongType, nullable = true))))
        }
        val out = Files.createTempDirectory("zarr_app").resolve("g.zarr").toString
        grid(0, nA).write.format("zarr")
          .option("coords", "t,x").option("chunkOuter", chunkOuter.toString)
          .option("zarrVersion", version).mode("overwrite").save(out)
        grid(nA, nTotal).write.format("zarr")
          .option("coords", "t,x").mode("append").save(out)
        val back = spark.read.format("zarr").load(out)
          .orderBy("t", "x").collect().map(_.toSeq).toSeq
        val want = grid(0, nTotal).orderBy("t", "x").collect().map(_.toSeq).toSeq
        Prop(back == want) :|
          s"chunk=$chunkOuter a=$nA total=$nTotal inner=$nInner v$version"
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(16), prop)
    assert(res.passed, res.status.toString)
  }
}
