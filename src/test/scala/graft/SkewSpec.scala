package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Skew, Tables}

/** Salting must change only the shuffle layout, never the result. */
class SkewSpec extends AnyFunSuite {
  import TestSession._

  private lazy val li = Tables.load(spark, sf, "lineitem") // l_returnflag is heavily skewed
  private lazy val dim = li.select("l_returnflag").distinct()
    .withColumn("flag_name", concat(lit("flag_"), col("l_returnflag")))

  test("saltedJoin equals plain join") {
    val plain = li.join(dim, Seq("l_returnflag"))
      .groupBy("flag_name").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(li, dim, "l_returnflag", saltFactor = 8)
      .groupBy("flag_name").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain && plain.nonEmpty)
  }

  test("saltedSum equals plain sum (exact decimal values)") {
    val dec = li.withColumn("q", col("l_quantity").cast(DecimalType(12, 2)))
    val plain = dec.groupBy("l_returnflag").agg(sum(col("q")).as("total"))
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    val salted = Skew.saltedSum(dec, "l_returnflag", col("q"), "total", saltFactor = 8)
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    assert(salted == plain && plain.nonEmpty)
  }
}
