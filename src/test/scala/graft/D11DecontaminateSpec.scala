package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Dedup

/** d11 fuzzy decontamination: a scripted corpus pins the BIPARTITE
  * contract — train×eval near-dup pairs are reported, train×train and
  * eval×eval near-dups are NOT (they're d3's job) — and the plan
  * check pins the scale contract: the eval side broadcasts, so the
  * training bands never shuffle. Value equality vs the DuckDB oracle
  * at corpus scale is the driver's gate. */
class D11DecontaminateSpec extends AnyFunSuite {
  import TestSession._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("d11spec").toFile
    d.deleteOnExit()
    val passage = (1 to 30).map(i => s"tok$i word$i").mkString(" ")
    def unique(tag: String) =
      (1 to 40).map(i => s"$tag$i").mkString(" ")
    val rows = Seq(
      // train docs (pmod 10 != 0); 5 and 6 are near-copies of EACH
      // OTHER — a train-train dup d11 must NOT report
      (1L, unique("alpha"), "en", "a", 0L),
      (2L, unique("beta"), "en", "a", 0L),
      (3L, passage, "en", "a", 0L),
      (5L, unique("gamma"), "en", "a", 0L),
      (6L, unique("gamma"), "en", "a", 0L),
      // eval docs (pmod 10 = 0); both copy doc 3's passage, so both
      // contaminate it — but the 10-20 eval-eval dup must NOT appear
      (10L, passage, "en", "a", 0L),
      (20L, passage, "en", "a", 0L))
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${d.getAbsolutePath}/documents.parquet")
    d.getAbsolutePath
  }

  test("train x eval near-dups reported; train-train and eval-eval excluded") {
    val got = Dedup.d11_decontaminate(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    assert(got === Seq((3L, 10L, 1.0), (3L, 20L, 1.0)))
  }

  test("the eval side broadcasts: band join is a BroadcastHashJoin") {
    val df = Dedup.d11_decontaminate(spark, dir)
    df.count() // finalize any adaptive plan
    def ops(p: SparkPlan): Seq[SparkPlan] = p +: (p.children ++
      p.subqueries).flatMap(ops) match {
      case s => s.flatMap {
        case a: AdaptiveSparkPlanExec => ops(a.executedPlan)
        case o => Seq(o)
      }
    }
    val plan = ops(df.queryExecution.executedPlan)
    assert(plan.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "eval bands must broadcast — the training side of a decontamination " +
        "sweep is the 100 TB side and must not shuffle")
  }
}
