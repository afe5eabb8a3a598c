package graft

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guard over the WHOLE gate: no query may plan
  * a cartesian product, and broadcast-nested-loop joins are allowed
  * only where a single-row or constant-size broadcast makes them the
  * right plan (documented allowlist). Catches the classic regression
  * where an edited join condition silently degenerates to a cross
  * product that "works" at sf0.01 and detonates at scale. */
class PlanAuditSpec extends AnyFunSuite {
  import TestSession._

  private val dir = "/root/testdata/sf0.001"

  /** BNLJ appears legitimately where one side is a broadcast
    * single-row aggregate (corpus size N, centroid count, …). */
  private val bnljAllowed = Set(
    "c4_tfidf", "c8_decontaminate", "d2_dedup_ngram",
    "d6_dedup_apply", "m1_multimodal_decode", "q33_funnel",
    "s1_ann_brute", "s3_ann_ivf", "s5_kmeans", "t7_text_pmi",
    "t8_text_heavyhitters", "cp1_pipeline")

  private def operators(p: SparkPlan): Seq[SparkPlan] = {
    val expanded = p match { case a: AdaptiveSparkPlanExec => a.executedPlan; case o => o }
    Seq(expanded) ++ expanded.children.flatMap(operators) ++
      expanded.subqueries.flatMap(operators)
  }

  test("d5 tiled all-pairs: one hash shuffle, no broadcast, no BNLJ") {
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    val plan = pipeline.Dedup.d5_dedup_embedding(spark, dir)
      .queryExecution.executedPlan
    val ops = operators(plan)
    assert(ops.count(_.isInstanceOf[ShuffleExchangeExec]) == 1,
      "tiling must cost exactly the one group-key exchange")
    assert(!ops.exists(_.isInstanceOf[BroadcastExchangeExec]))
    assert(!ops.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]))
  }

  test("no gate query plans a cartesian product; BNLJ only on the allowlist") {
    val skip = (n: String) => n.startsWith("st") || n.startsWith("z6") ||
      n.startsWith("z8") || n.startsWith("z9") || n == "d7_dedup_clusters"
    SparkEntry.queries.toSeq.sortBy(_._1).filterNot(q => skip(q._1))
      .foreach { case (name, fn) =>
        val plan = fn(spark, dir).queryExecution.executedPlan
        val ops = operators(plan)
        assert(!ops.exists(_.isInstanceOf[CartesianProductExec]),
          s"$name plans a cartesian product")
        if (ops.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]))
          assert(bnljAllowed(name),
            s"$name plans a BroadcastNestedLoopJoin but is not on the allowlist")
      }
  }
}
