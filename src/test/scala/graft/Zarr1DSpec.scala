package graft

import org.scalatest.funsuite.AnyFunSuite

/** 1-D stores — the classic time-series layout (one coordinate, 1-D
  * measurements). Shape alone cannot distinguish a 1-D data variable
  * from a coordinate; classification honors the `_ARRAY_DIMENSIONS`
  * attribute our writer emits (an array whose declared dimension is a
  * different array is a data variable). Attribute-less stores keep the
  * reference's 1-D ⇒ coordinate rule. */
class Zarr1DSpec extends AnyFunSuite {
  import TestSession._

  test("1-D store round-trips: write, classify, append, filter") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("zarr1d")
      .resolve("s.zarr").toString
    Seq((0L, 3.0), (1L, 5.0)).toDF("t", "total").write.format("zarr")
      .option("coords", "t").option("chunkOuter", "1")
      .mode("overwrite").save(out)
    val m = graft.sources.zarr.ZarrMeta.readStore(out)
    assert(m.coordNames == Seq("t"), m.coordNames)
    assert(m.dataVars.map(_.name) == Seq("total"))
    Seq((10L, 4.0)).toDF("t", "total").write.format("zarr")
      .mode("append").save(out)
    val df = spark.read.format("zarr").load(out)
    assert(df.orderBy("t").collect().map(_.toSeq).toSeq ==
      Seq(Seq(0L, 3.0), Seq(1L, 5.0), Seq(10L, 4.0)))
    // coordinate filter still prunes on the 1-D grid
    assert(df.filter($"t" === 10L).collect().map(_.toSeq).toSeq ==
      Seq(Seq(10L, 4.0)))
  }

  test("1-D store streams end-to-end: source follows appends, sink appends") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("zarr1d_stream")
    val src = base.resolve("src.zarr").toString
    val dst = base.resolve("dst.zarr").toString
    Seq((0L, 1.0), (1L, 2.0)).toDF("t", "v").write.format("zarr")
      .option("coords", "t").option("chunkOuter", "1")
      .mode("overwrite").save(src)
    val q = spark.readStream.format("zarr").load(src)
      .writeStream.outputMode("append").format("zarr")
      .option("path", dst)
      .option("coords", "t").option("chunkOuter", "1")
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      Seq((2L, 3.0)).toDF("t", "v").write.format("zarr").mode("append").save(src)
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.read.format("zarr").load(dst).orderBy("t")
      .collect().map(_.toSeq).toSeq ==
      Seq(Seq(0L, 1.0), Seq(1L, 2.0), Seq(2L, 3.0)))
  }
}
