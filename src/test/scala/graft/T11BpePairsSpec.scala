package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TextAnalysis

/** t11 BPE pair statistics: a scripted corpus (the classic
  * low/lower/newest/widest BPE example) is checked against an
  * INDEPENDENT plain-Scala reference implementation — same weighting
  * rule (each pair occurrence weighted by its word's corpus
  * frequency, pairs counted per occurrence so "aaa" contributes
  * (a,a) twice), same deterministic order. Value equality vs the
  * DuckDB oracle at corpus scale is the driver's gate. */
class T11BpePairsSpec extends AnyFunSuite {
  import TestSession._

  private def reference(texts: Seq[String]): Seq[(String, String, Long, Long)] = {
    val wc = texts.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rows = wc.toSeq.filter(_._1.length >= 2).flatMap { case (w, c) =>
      (0 until w.length - 1).map(i =>
        ((w.substring(i, i + 1), w.substring(i + 1, i + 2)), w, c))
    }
    rows.groupBy(_._1).map { case ((a, b), occ) =>
      (a, b, occ.map(_._3).sum, occ.map(_._2).distinct.size.toLong)
    }.toSeq.sortBy(r => (-r._3, r._1, r._2)).take(50)
  }

  test("scripted corpus matches the independent reference, order and counts exact") {
    // the Sennrich et al. running example: low x5, lower x2,
    // newest x6, widest x3 — plus a repeated-letter word ("aaa") so
    // the within-word multi-occurrence rule is exercised, and a
    // 1-char word that must contribute no pairs
    val texts = Seq(
      Seq.fill(5)("low").mkString(" "),
      (Seq.fill(2)("lower") ++ Seq.fill(3)("newest")).mkString(" "),
      (Seq.fill(3)("newest") ++ Seq.fill(3)("widest")).mkString(" "),
      "aaa a aaa")
    val dir = Files.createTempDirectory("t11spec").toFile
    dir.deleteOnExit()
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "a", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${dir.getAbsolutePath}/documents.parquet")
    val got = TextAnalysis.t11_bpe_pairs(spark, dir.getAbsolutePath)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val want = reference(texts)
    assert(got === want)
    // spot-pin the headline merges of the textbook example: "es"/"st"
    // ride newest(6) + widest(3) = 9; (a,a) from "aaa" x2 occurrences
    // x2 copies = 4 weighted, 1 distinct word
    assert(got.find(p => p._1 == "e" && p._2 == "s").map(_._3) === Some(9L))
    assert(got.find(p => p._1 == "s" && p._2 == "t").map(_._3) === Some(9L))
    assert(got.find(p => p._1 == "a" && p._2 == "a") === Some(("a", "a", 4L, 1L)))
  }

  test("sf0.001: top-50 is full, descending, tie-broken, and pair-length-1 chars") {
    val got = TextAnalysis.t11_bpe_pairs(spark, sf).collect()
    assert(got.length == 50)
    val counts = got.map(_.getLong(2))
    assert(counts.sameElements(counts.sortBy(-_)), "not descending")
    got.foreach { r =>
      assert(r.getString(0).length == 1 && r.getString(1).length == 1)
      assert(r.getLong(3) >= 1L && r.getLong(3) <= r.getLong(2))
    }
  }
}
