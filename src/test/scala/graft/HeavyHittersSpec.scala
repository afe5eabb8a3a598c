package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MisraGries

/** Misra-Gries bounds, checked against exact counts: every token with
  * true frequency > N/k is found, estimates are undercounts within
  * the sketch's own error bound, and the guarantee holds regardless
  * of how partitions (and hence sketch merges) are arranged. */
class HeavyHittersSpec extends AnyFunSuite {
  import TestSession._

  private val dir = "/root/testdata/sf0.001"

  private def tokens = graft.operators.Tables.load(spark, dir, "documents")
    .select(explode(split(col("text"), " ")).as("t"))
    .filter(col("t") =!= "")

  test("MG guarantee: frequent items found, counts bounded, any merge order") {
    val exact = tokens.groupBy("t").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val k = 32
    for (parts <- Seq(1, 7, 32)) {
      val mg = udaf(new MisraGries(k))
      val row = tokens.repartition(parts)
        .agg(mg(col("t")).as("s")).collect().head
      val sketch = row.getSeq[org.apache.spark.sql.Row](0)
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(sketch.size <= k)
      exact.foreach { case (t, c) =>
        if (c > n / k)
          assert(sketch.contains(t), s"frequent '$t' ($c > ${n / k}) missing at parts=$parts")
      }
      sketch.foreach { case (t, (est, upper)) =>
        val c = exact(t)
        assert(est <= c, s"'$t' overcounted: $est > $c")
        assert(c <= upper, s"'$t' bound violated: $c > $upper")
      }
    }
  }

  test("gate query emits exactly the exact-frequent set, all within MG bounds") {
    val got = graft.pipeline.TextAnalysis
      .t8_text_heavyhitters(spark, dir).collect()
    assert(got.nonEmpty)
    val exact = tokens.groupBy("t").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    // c*k > n ⇔ c > n/k (integer div): the two frequent-set definitions agree
    val frequent = exact.filter { case (_, c) => c * 32 > n }.keySet
    val emitted = got.map(_.getString(0)).toSet
    assert(emitted == frequent,
      s"missing: ${frequent -- emitted}; extra: ${emitted -- frequent}")
    got.foreach { r =>
      assert(r.getAs[Boolean]("within_bound"), r.toString)
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("exact_count") == exact(r.getString(0)))
    }
  }
}
