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

  test("random skew profiles: salted ops equal plain ops at every salt factor") {
    // Randomized counterpart of the fixed-corpus tests: seeded Zipf-ish
    // datasets where one key takes most of the mass (the exact shape
    // salting exists for), including single-key, all-duplicate-row and
    // empty-group corners the corpus can't produce. Content salting
    // must keep results identical for ANY data x saltFactor.
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 6).foreach { trial =>
      val nKeys = 1 + rnd.nextInt(5)
      val hotShare = 0.5 + rnd.nextDouble() * 0.5 // 50-100% on key 0
      val n = 200 + rnd.nextInt(800)
      val rows = (0 until n).map { i =>
        val k = if (rnd.nextDouble() < hotShare) 0 else rnd.nextInt(nKeys)
        // duplicate row values on purpose: identical rows share a salt
        (s"k$k", (rnd.nextInt(7)).toLong)
      }
      val df = rows.toDF("key", "v")
        .withColumn("q", col("v").cast(DecimalType(12, 2))).cache()
      val dim = (0 until nKeys).map(k => (s"k$k", s"name_$k")).toDF("key", "name")
      val saltFactor = 1 + rnd.nextInt(15)
      val plainSum = df.groupBy("key").agg(sum(col("q")).as("t"))
        .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
      val saltSum = Skew.saltedSum(df, "key", col("q"), "t", saltFactor)
        .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
      assert(saltSum == plainSum, s"trial $trial sum mismatch (salt=$saltFactor)")
      val plainJoin = df.join(dim, Seq("key")).groupBy("name")
        .agg(count(lit(1)).as("n")).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val saltJoin = Skew.saltedJoin(df, dim, "key", saltFactor).groupBy("name")
        .agg(count(lit(1)).as("n")).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(saltJoin == plainJoin, s"trial $trial join mismatch (salt=$saltFactor)")
      df.unpersist()
    }
  }
}
