package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorOps
import graft.operators.Tables

/** The codegen'd FloatVecDot must be bit-identical to the
  * higher-order-function fold (which in turn matches the DuckDB
  * oracle). */
class VectorOpsSpec extends AnyFunSuite {
  import TestSession._

  test("FloatVecDot == dotHof bit-for-bit on real embeddings") {
    val e = Tables.load(spark, sf, "embeddings").limit(100)
    val pairs = e.as("a").crossJoin(e.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(
        VectorOps.dot(col("a.embedding"), col("b.embedding")).as("fast"),
        VectorOps.dotHof(col("a.embedding"), col("b.embedding")).as("ref"))
    val bad = pairs.filter(col("fast") =!= col("ref")).count()
    assert(bad == 0)
    assert(pairs.count() > 0)
  }

  test("d5's tiled inner-loop cosine == Catalyst cosine bit-for-bit") {
    val e = Tables.load(spark, sf, "embeddings").limit(60)
    val catalyst = e.as("a").crossJoin(e.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"),
        col("a.embedding"), col("b.embedding"),
        VectorOps.cosine(col("a.embedding"), col("b.embedding")).as("cos"))
      .collect()
    assert(catalyst.nonEmpty)
    catalyst.foreach { r =>
      val x = r.getSeq[Float](2).toArray
      val y = r.getSeq[Float](3).toArray
      def n2(v: Array[Float]) = graft.pipeline.Dedup.cosineOf(v, v, 1.0, 1.0) // dot(v,v)/1
      val scala = graft.pipeline.Dedup.cosineOf(x, y, n2(x), n2(y))
      val bits = java.lang.Double.doubleToLongBits _
      assert(bits(scala) == bits(r.getDouble(4)),
        s"vec ${r.getLong(0)}~${r.getLong(1)}: scala=$scala catalyst=${r.getDouble(4)}")
    }
  }

  test("norm2 and cosine behave") {
    val e = Tables.load(spark, sf, "embeddings").limit(5)
    val rows = e.select(
      VectorOps.cosine(col("embedding"), col("embedding")).as("self")).collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }
}
