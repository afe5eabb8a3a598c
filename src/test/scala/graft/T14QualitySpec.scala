package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec}
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TextAnalysis

/** t14 n-gram linear quality classifier, pinned against an
  * INDEPENDENT plain-Scala reference: derive the top-k
  * unigram+bigram weight table (count desc, gram asc; integer weight
  * formula over rank and length) with ordinary collections, score
  * every document by summed matched weights with multiplicity, and
  * compare exactly — including the deterministic tiebreak, the
  * empty-token discipline, and zero-score docs surviving the left
  * join. Value equality vs the DuckDB oracle at corpus scale is the
  * driver's gate. */
class T14QualitySpec extends AnyFunSuite {
  import TestSession._

  /** Reference scorer: same semantics, no Spark. */
  private def reference(texts: Seq[(Long, String)], k: Int)
      : Map[Long, (Long, Long, Boolean)] = {
    def grams(t: String): Seq[String] = {
      val ws = t.split(" ", -1)
      val uni = ws.filter(_.nonEmpty).toSeq
      val big = (0 until ws.length - 1).collect {
        case i if ws(i).nonEmpty && ws(i + 1).nonEmpty => s"${ws(i)} ${ws(i + 1)}"
      }
      uni ++ big
    }
    val all = texts.flatMap { case (_, t) => grams(t) }
    val counts = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val top = counts.toSeq.sortBy { case (g, c) => (-c, g) }.take(k)
    val weights = top.zipWithIndex.map { case ((g, _), i) =>
      val rank = i + 1L
      val sign = if (rank % 3 == 0) 1L else -1L
      g -> sign * ((g.length * 7L + rank) % 23 + 1)
    }.toMap
    texts.map { case (id, t) =>
      val hits = grams(t).flatMap(weights.get)
      id -> ((hits.size.toLong, hits.sum, hits.sum >= 0L))
    }.toMap
  }

  test("sf0.001 corpus: engine scores == plain-Scala reference, exactly") {
    val dir = "/root/testdata/sf0.001"
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    val want = reference(texts, 500)
    val got = TextAnalysis.t14_quality_classify(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, v) => assert(v == want(id), s"doc $id") }
    // at least one doc must actually match something, or the test is
    // vacuous
    assert(got.values.exists(_._1 > 0))
  }

  test("scripted edge corpus: empty tokens, tiny k, zero-gram doc") {
    import spark.implicits._
    import java.nio.file.Files
    val dir = Files.createTempDirectory("t14spec").toFile
    dir.deleteOnExit()
    val texts = Seq(
      (1L, "a b a b a"),      // dense repeats → top grams
      (2L, "a  b"),           // double space: no (a b) bigram
      (3L, ""),               // zero grams → score 0, keep
      (4L, "c a b"))
    texts.map { case (i, t) => (i, t, "en", "x", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${dir.getAbsolutePath}/documents.parquet")
    val want = reference(texts.map(t => (t._1, t._2)), 3)
    val got = TextAnalysis.qualityClassify(spark, dir.getAbsolutePath, 3, "")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got == want)
    assert(got(3L) == ((0L, 0L, true)), "zero-gram doc scores 0 and keeps")
  }

  test("dispatch: weight table broadcasts under the cut, shuffles above; rows identical") {
    def ops(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: ops(a.executedPlan)
      case q: QueryStageExec => q +: ops(q.plan)
      case o => o +: (o.children ++ o.subqueries).flatMap(ops)
    }
    val dir = "/root/testdata/sf0.001"
    val bc = TextAnalysis.qualityClassify(spark, dir, 500, "")
    val bcRows = bc.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).sortBy(_._1)
    assert(TextAnalysis.lastQualityDispatch == "bcast")
    assert(ops(bc.queryExecution.executedPlan).exists(_.isInstanceOf[BroadcastHashJoinExec]))
    val sh = TextAnalysis.qualityClassify(spark, dir, 500, "", bcastMax = 0L)
    val shRows = sh.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).sortBy(_._1)
    assert(TextAnalysis.lastQualityDispatch == "shuffle")
    assert(ops(sh.queryExecution.executedPlan).exists(_.isInstanceOf[ShuffledHashJoinExec]))
    assert(bcRows.toSeq == shRows.toSeq)
  }
}
