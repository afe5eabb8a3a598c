package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ScaleUp's perturbed-documents mode (`perturb`): the sketch-family
  * scale probes need a corpus whose DUPLICATION RATE stays at the
  * source rate when replicated — byte-identical replicas would make
  * the true near-dup answer grow ~R². The contract verified here:
  * deterministic, statistic-preserving (char length, word multiset),
  * duplicate-structure-preserving within a replica, divergent across
  * replicas.
  */
class ScaleUpSpec extends AnyFunSuite {
  import TestSession._

  private def mini = {
    import spark.implicits._
    // doc 3 duplicates doc 0 byte-for-byte (a true exact-dup pair)
    Seq(
      (0L, "key agg row scan slow fast table value part hash", "en", "web", 49L),
      (1L, "batch window spark order data column agg join small line", "en", "web", 57L),
      (2L, "the line sort table window table key merge", "de", "book", 43L),
      (3L, "key agg row scan slow fast table value part hash", "en", "web", 49L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("perturb is deterministic and preserves per-doc statistics") {
    val a = ScaleUp.perturbDocuments(mini, 1L).orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    val b = ScaleUp.perturbDocuments(mini, 1L).orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    assert(a == b && a.size == 40)
    // char length and word multiset survive every replica
    val src = mini.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    a.foreach { row =>
      val (id, text) = (row.head.asInstanceOf[Long], row(1).asInstanceOf[String])
      val orig = src(id % 5000L)
      assert(text.length == orig.length, s"doc $id length changed")
      assert(text.split(' ').sorted.toSeq == orig.split(' ').sorted.toSeq,
        s"doc $id word multiset changed")
      assert(row(4).asInstanceOf[Long] == orig.length.toLong)
    }
  }

  test("replica 0 is the source; replicas r > 0 permute; duplicates stay duplicates") {
    val out = ScaleUp.perturbDocuments(mini, 1L).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val src = mini.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // replica 0 byte-identical
    src.foreach { case (id, t) => assert(out(id) == t) }
    // each replica r > 0 of the multi-word docs differs from the source
    // text (a 10-word permutation fixing the identity has odds ~1/10!)
    (1 to 9).foreach { r =>
      assert((0L to 3L).exists(id => out(id + 5000L * r) != src(id)),
        s"replica $r left every text unchanged")
    }
    // the exact-dup pair (docs 0 and 3) permutes IDENTICALLY in every
    // replica — content-keyed seed, so within-replica duplicate
    // structure is preserved byte-for-byte
    (0 to 9).foreach { r =>
      assert(out(0L + 5000L * r) == out(3L + 5000L * r),
        s"replica $r broke the exact-dup pair")
    }
    // replicas of the same doc diverge from each other (rate, not count:
    // all 10 replicas of doc 1 pairwise distinct)
    val reps = (0 to 9).map(r => out(1L + 5000L * r))
    assert(reps.distinct.size == 10, "cross-replica texts collided")
  }

  test("composed runs stay collision-free (the srcFactor salt)") {
    // sf0.1 -> sf1p -> sf10p composition: stage 2 re-perturbs stage 1's
    // output, which retains every stage-1 text as replica 0. Without
    // the per-run seed salt, stage 2's perturb(text, r) reproduced
    // stage 1's output for those texts (measured: 9% exact-dup rate at
    // sf10p). The only permitted duplicate texts in the composed
    // corpus are the replicas of the source's own exact-dup pair.
    val stage1 = ScaleUp.perturbDocuments(mini, 1L)
    val stage2 = ScaleUp.perturbDocuments(stage1, 10L)
    val texts = stage2.select("text").collect().map(_.getString(0)).toSeq
    assert(texts.size == 400)
    // docs 0 and 3 are byte-identical, so each composed replica holds
    // their (identical) permutation twice: 400 rows, 2 distinct texts
    // per replicated dup-pair slot -> 400 - 100 distinct
    assert(texts.distinct.size == 300,
      s"expected 300 distinct texts, got ${texts.distinct.size}")
  }
}
