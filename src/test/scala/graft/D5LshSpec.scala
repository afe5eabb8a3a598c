package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Dedup

/** d5's duplicate-threshold mode: banded hyperplane-LSH candidate
  * generation (s2's planes) + exact-cosine verify must produce EXACTLY
  * the tiled exact join's output at θ = 0.85 — the end-to-end proof of
  * the documented 100-TB escape hatch for duplicate-shaped thresholds.
  *
  * The raw corpus has no pairs above cosine 0.61 (checked empirically),
  * so the spec plants near-duplicates: perturbed copies of the first
  * 40 vectors at two deterministic perturbation strengths (cosine
  * ≈ 0.99 and ≈ 0.86), giving qualifying pairs on both sides of the
  * candidate-recall cliff.
  */
class D5LshSpec extends AnyFunSuite {
  import TestSession._

  /** Corpus ∪ deterministically perturbed copies: copy of vec v gets
    * id v + offset and embedding e_i · (1 + amp · sin(i + v)). */
  private def planted(): DataFrame = {
    val e = graft.operators.Tables.load(spark, sf, "embeddings")
      .select("vec_id", "embedding").filter(col("embedding").isNotNull)
    def perturbed(offset: Long, amp: Double, n: Int): DataFrame =
      e.filter(col("vec_id") < n)
        .select((col("vec_id") + offset).as("vec_id"),
          expr(s"transform(embedding, (x, i) -> CAST(x * (1.0 + $amp * sin(CAST(i AS DOUBLE) + CAST(vec_id AS DOUBLE))) AS FLOAT))")
            .as("embedding"))
    e.unionAll(perturbed(100000L, 0.05, 40))   // cosine ≈ 0.999
      .unionAll(perturbed(200000L, 0.80, 40))  // cosine ≈ 0.87 — near the threshold
  }

  private def pairsOf(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def operators(p: SparkPlan): Seq[SparkPlan] = {
    val expanded = p match { case a: AdaptiveSparkPlanExec => a.executedPlan; case o => o }
    Seq(expanded) ++ expanded.children.flatMap(operators) ++
      expanded.subqueries.flatMap(operators)
  }

  test("LSH mode output == tiled exact output at theta=0.85, bit-identical cosines") {
    val corpus = planted().persist()
    try {
      val tiled = pairsOf(Dedup.tiledPairs(
        corpus.select(col("vec_id"), col("embedding"),
          graft.functions.VectorOps.norm2(col("embedding")).as("n2")), 0.85))
      val lsh = pairsOf(Dedup.embeddingPairs(corpus, 0.85))
      assert(tiled.nonEmpty, "planted corpus must actually contain qualifying pairs")
      // strong dups AND threshold-adjacent dups both present
      assert(tiled.exists(_._3 > 0.99) && tiled.exists(_._3 < 0.9),
        s"perturbation strengths should straddle: ${tiled.map(_._3)}")
      assert(lsh == tiled,
        s"missing=${(tiled -- lsh).take(5)} extra=${(lsh -- tiled).take(5)}")
    } finally { corpus.unpersist(); () }
  }

  test("LSH mode == tiled exact AT the dispatch boundary itself (theta=0.80)") {
    // embeddingPairs(0.80) routes to LSH (>= d5LshThreshold); if the
    // banding's recall were unsound anywhere, the boundary — where the
    // admitted angles are widest — is where pairs would go missing.
    val corpus = planted().persist()
    try {
      val tiled = pairsOf(Dedup.tiledPairs(
        corpus.select(col("vec_id"), col("embedding"),
          graft.functions.VectorOps.norm2(col("embedding")).as("n2")), 0.80))
      val lsh = pairsOf(Dedup.embeddingPairs(corpus, 0.80))
      assert(tiled.nonEmpty)
      assert(lsh == tiled,
        s"missing=${(tiled -- lsh).take(5)} extra=${(lsh -- tiled).take(5)}")
    } finally { corpus.unpersist(); () }
  }

  test("LSH mode plans equality joins only: no BNLJ, no cartesian") {
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    val df = Dedup.embeddingPairs(planted(), 0.85)
    df.count()
    val ops = operators(df.queryExecution.executedPlan)
    assert(!ops.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "candidate generation must be an equality join on band keys")
    assert(!ops.exists(_.isInstanceOf[CartesianProductExec]))
  }

  test("threshold dispatch: below the boundary takes the tiled path (one shuffle)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val corpus = planted()
    val low = Dedup.embeddingPairs(corpus, 0.4)
    low.count()
    // the tiled path's signature: flatMapGroups over the block keys —
    // exactly one exchange, no join operators at all
    val ops = operators(low.queryExecution.executedPlan)
    assert(ops.count(_.isInstanceOf[ShuffleExchangeExec]) == 1)
  }
}
