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

  test("norm2 and cosine behave") {
    val e = Tables.load(spark, sf, "embeddings").limit(5)
    val rows = e.select(
      VectorOps.cosine(col("embedding"), col("embedding")).as("self")).collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }
}
