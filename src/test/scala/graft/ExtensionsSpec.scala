package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** float_vec_dot must be callable from SQL when GraftExtensions is
  * installed, and match the Column-API result bit-for-bit. */
class ExtensionsSpec extends AnyFunSuite {

  // the shared test session installs GraftExtensions via
  // spark.sql.extensions (same config path the driver mains use)
  private lazy val spark: SparkSession = TestSession.spark

  test("float_vec_dot available in SQL") {
    val r = spark.sql(
      "SELECT float_vec_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d").collect().head
    assert(r.getDouble(0) == 1.5 * 3.0 + 2.0 * 0.5)
  }

  test("SQL and Column API agree on real embeddings") {
    import org.apache.spark.sql.functions._
    val e = operators.Tables.load(spark, TestSession.sf, "embeddings").limit(20)
    e.createOrReplaceTempView("emb_ext")
    val viaSql = spark.sql("""
      SELECT a.vec_id, b.vec_id, float_vec_dot(a.embedding, b.embedding) AS d
      FROM emb_ext a JOIN emb_ext b ON a.vec_id < b.vec_id""").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaCol = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"),
        functions.VectorOps.dot(col("a.embedding"), col("b.embedding")).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaSql == viaCol && viaSql.nonEmpty)
  }
}
