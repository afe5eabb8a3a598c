package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TextAnalysis

/** t13 BPE merge application, pinned against an INDEPENDENT
  * priority-queue reference: the reference runs the canonical
  * Sennrich et al. (2016) apply loop — repeatedly find the
  * lowest-rank merge whose pair is PRESENT among the word's current
  * symbols and merge all its occurrences leftmost-greedy — while the
  * engine unrolls one exhaustive pass per rank in rank order. For a
  * single-generation (character × character) merge table the two are
  * provably identical (merging never creates new single-character
  * symbols, so a later merge can never re-enable an earlier one);
  * this spec is the executable form of that proof, including the
  * overlap cases ("aaa" under (a,a)) where greedy direction matters.
  */
class T13BpeApplySpec extends AnyFunSuite {
  import TestSession._

  /** Canonical BPE apply: priority queue over ranks, merge-all per
    * pick, leftmost-greedy within a pick. Structurally UNLIKE the
    * engine's rank-ordered single passes. */
  private def referenceApply(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms: Vector[String] = word.map(_.toString).toVector
    var done = false
    while (!done) {
      val hit = merges.find { case (a, b) =>
        syms.indices.dropRight(1).exists(i => syms(i) == a && syms(i + 1) == b)
      }
      hit match {
        case None => done = true
        case Some((a, b)) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += syms(i); i += 1 }
          }
          syms = out.result()
      }
    }
    syms
  }

  /** Reference merge table: same ranking and tiebreak as the engine
    * (corpus-weighted pair count desc, then (a, b)). */
  private def referenceMerges(texts: Seq[String], m: Int): Seq[(String, String)] = {
    val wc = texts.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    wc.toSeq.filter(_._1.length >= 2).flatMap { case (w, c) =>
      (0 until w.length - 1).map(i => ((w(i).toString, w(i + 1).toString), c))
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy { case ((a, b), pc) => (-pc, a, b) }.map(_._1).take(m)
  }

  private def writeDocs(texts: Seq[String]): String = {
    val dir = Files.createTempDirectory("t13spec").toFile
    dir.deleteOnExit()
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "a", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${dir.getAbsolutePath}/documents.parquet")
    dir.getAbsolutePath
  }

  test("scripted corpus: engine segmentation == priority-queue reference, exactly") {
    // the textbook example plus overlap/chain adversaries: "aaa"/"aaaa"
    // (odd and even same-char runs), "abab" (alternation), "aab"
    // (rank order decides whether (a,a) or (a,b) wins the middle char)
    val texts = Seq(
      Seq.fill(5)("low").mkString(" "),
      (Seq.fill(2)("lower") ++ Seq.fill(6)("newest")).mkString(" "),
      Seq.fill(3)("widest").mkString(" "),
      "aaa aaaa abab aab a")
    val dir = writeDocs(texts)
    val merges = referenceMerges(texts, 20)
    import org.apache.spark.sql.functions.{col, count, explode, lit, split}
    val wc = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("c"))
    val got = TextAnalysis.bpeSegment(wc, merges).collect()
      .map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    got.keys.foreach { w =>
      assert(got(w) == referenceApply(w, merges),
        s"word '$w': engine ${got(w)} vs reference ${referenceApply(w, merges)}")
    }
    // and the greedy-direction pin explicitly: leftmost on odd runs
    if (merges.contains(("a", "a"))) {
      assert(got("aaa").head == "aa", "leftmost-greedy pairs the FIRST two of aaa")
      assert(got("aaaa") == referenceApply("aaaa", merges))
    }
  }

  test("gate output: per-doc counts match a from-scratch reference at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    val merges = referenceMerges(texts.map(_._2), 20)
    val want = texts.map { case (id, t) =>
      val ws = t.split(" ").filter(_.nonEmpty)
      id -> ((ws.length.toLong, ws.map(w => referenceApply(w, merges).length.toLong).sum))
    }.toMap
    val got = TextAnalysis.t13_bpe_apply(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, (nw, nb)) =>
      assert((nw, nb) == want(id), s"doc $id")
    }
  }

  test("vocab-size dispatch: both join plans pinned, results identical") {
    // Below the cut the corpus⋈vocab join must broadcast the vocab;
    // above it (cut forced to 0) it must ride a shuffled hash join —
    // the 10⁸-type noisy-crawl path where a forced broadcast would
    // die on driver/broadcast limits. The ROWS must not move.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec}
    // QueryStageExec is a LeafExecNode under AQE — its materialized
    // subtree hangs off .plan, not .children, so unwrap both wrappers
    def ops(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: ops(a.executedPlan)
      case q: QueryStageExec => q +: ops(q.plan)
      case o => o +: (o.children ++ o.subqueries).flatMap(ops)
    }
    val dir = "/root/testdata/sf0.001"
    val bc = TextAnalysis.bpeApply(spark, dir, 20, "")
    val bcRows = bc.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(TextAnalysis.lastBpeDispatch == "bcast")
    assert(ops(bc.queryExecution.executedPlan).exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "below the cut the segmented vocab must broadcast")
    val sh = TextAnalysis.bpeApply(spark, dir, 20, "", bcastMaxVocab = 0L)
    val shRows = sh.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(TextAnalysis.lastBpeDispatch == "shuffle")
    assert(ops(sh.queryExecution.executedPlan).exists(_.isInstanceOf[ShuffledHashJoinExec]),
      "above the cut the corpus⋈vocab join must be a shuffled hash join")
    assert(bcRows.toSeq == shRows.toSeq,
      "the dispatch moves the join strategy, never the result")
  }

  test("custom merge table: chained ranks behave as priority order") {
    // (e,r) then (h,e): "her" → ranks say (e,r) first, consuming the e
    // — so (h,e) must NOT apply afterwards: [h, er], never [he, r]
    import spark.implicits._
    val wc = Seq(("her", 1L), ("hehe", 1L), ("err", 1L))
      .toDF("word", "c")
    val seg = TextAnalysis.bpeSegment(wc, Seq(("e", "r"), ("h", "e")))
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(seg("her") == Seq("h", "er"))
    assert(seg("hehe") == Seq("he", "he"))
    assert(seg("err") == Seq("er", "r"))
  }
}
