package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TextAnalysis

/** t12 bigram-LM quality scoring: a scripted corpus is checked
  * against an independent plain-Scala reference (same integer
  * quantization, same bigram/context counting), including a doc too
  * short for any bigram. Value equality vs the DuckDB oracle at
  * corpus scale is the driver's gate. */
class T12LmScoreSpec extends AnyFunSuite {
  import TestSession._

  private def reference(texts: Seq[(Long, String)]): Seq[(Long, Long, Long)] = {
    val docBi = texts.map { case (id, t) =>
      val w = t.split(" ").toSeq
      id -> (if (w.length < 2) Nil
             else w.sliding(2).map(p => (p(0), p(1)))
               .filter(p => p._1.nonEmpty && p._2.nonEmpty).toSeq)
    }
    val all = docBi.flatMap(_._2)
    val na = all.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nab = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    docBi.map { case (id, bs) =>
      if (bs.isEmpty) (id, 0L, 0L)
      else {
        val s = bs.map(p => nab(p) * 1000000L / na(p._1)).sum
        (id, bs.size.toLong, s / bs.size)
      }
    }.sortBy(_._1)
  }

  test("scripted corpus matches the independent reference, short doc scores 0") {
    val texts = Seq[(Long, String)](
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the cat"),
      // all-hapax contexts: each context has ONE continuation, so
      // every bigram scores the full 10^6 (p(b|a)=1) — the documented
      // artifact of a conditional-ratio proxy (a real perplexity
      // filter weights by context probability too; this op is the
      // exact-arithmetic statistic, not the smoothed LM)
      (3L, "zebra quark vortex nim"),
      (4L, "single"),                   // no bigram: n_bigrams 0, score 0
      (5L, "the cat sat on the mat again and again"))
    val dir = Files.createTempDirectory("t12spec").toFile
    dir.deleteOnExit()
    import spark.implicits._
    texts.map { case (i, t) => (i, t, "en", "a", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${dir.getAbsolutePath}/documents.parquet")
    val got = TextAnalysis.t12_text_lmscore(spark, dir.getAbsolutePath)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === reference(texts))
    val byId = got.map(g => g._1 -> g._3).toMap
    // hapax-context doc pegs the quantized maximum; ambiguous contexts
    // ("the" -> {cat, mat}) pull the others strictly below it
    assert(byId(3L) == 1000000L)
    Seq(1L, 2L, 5L).foreach(id => assert(byId(id) < 1000000L && byId(id) > 0L))
    assert(byId(4L) == 0L && got.find(_._1 == 4L).get._2 == 0L)
  }

  test("sf0.001: every doc scored once, scores inside the quantized range") {
    val docs = graft.operators.Tables.load(spark, sf, "documents").count()
    val got = TextAnalysis.t12_text_lmscore(spark, sf)
    assert(got.count() == docs)
    assert(got.filter("lm_score < 0 OR lm_score > 1000000").isEmpty)
    assert(got.filter("n_bigrams = 0 AND lm_score <> 0").isEmpty)
    spark.catalog.clearCache()
  }
}
