package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Dedup

/** Cross-parameter SEMANTIC invariants of the parametric dedup entry
  * points — mathematics the differential fuzz cannot check (it proves
  * engine ≡ oracle at each point, not that the points relate
  * correctly to each other):
  *
  *  - threshold monotonicity: raising a similarity cut can only
  *    shrink the pair set (d3 agreement θ, d4 Hamming, d5 cosine θ —
  *    for d5 across the LSH/tiled DISPATCH boundary, so a recall gap
  *    in the LSH path would surface here as a violation);
  *  - span containment in minDocs: every ≥3-doc span lies inside a
  *    ≥2-doc span (dup₃ positions ⊆ dup₂ positions, and maximal runs
  *    of a subset lie within maximal runs of the superset);
  *  - span coverage containment in W: every token covered by a
  *    W=9 span is covered by a W=8 span (a duplicated 9-window's two
  *    8-subwindows are duplicated across the same doc pair).
  */
class ParamPropSpec extends AnyFunSuite {
  import TestSession._

  private def pairSet(df: DataFrame, a: String, b: String): Set[(Long, Long)] =
    df.select(col(a), col(b)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("d3: agreement 1.0 pairs ⊆ 0.75 pairs ⊆ 0.5 pairs") {
    val loose = pairSet(Dedup.minhashPairs(spark, sf, "0.5", ""), "doc_a", "doc_b")
    val gate = pairSet(Dedup.minhashPairs(spark, sf, "0.75", ""), "doc_a", "doc_b")
    val tight = pairSet(Dedup.minhashPairs(spark, sf, "1.0", ""), "doc_a", "doc_b")
    assert(tight.subsetOf(gate), "agreement=1.0 produced a pair absent at 0.75")
    assert(gate.subsetOf(loose), "agreement=0.75 produced a pair absent at 0.5")
    assert(loose.size > gate.size, "loosening the cut found nothing new — vacuous corpus")
  }

  test("d4: hamming 1 pairs ⊆ 2 ⊆ 3") {
    val h1 = pairSet(Dedup.simhashPairs(spark, sf, 1, ""), "doc_a", "doc_b")
    val h2 = pairSet(Dedup.simhashPairs(spark, sf, 2, ""), "doc_a", "doc_b")
    val h3 = pairSet(Dedup.simhashPairs(spark, sf, 3, ""), "doc_a", "doc_b")
    assert(h1.subsetOf(h2) && h2.subsetOf(h3))
  }

  test("d5: cosine θ monotone ACROSS the LSH/tiled dispatch boundary") {
    val emb = graft.operators.Tables.load(spark, sf, "embeddings")
    // 0.75 → tiled exact; 0.85 → banded LSH. An LSH recall gap would
    // manufacture a pair at 0.85 that the exact 0.75 sweep lacks.
    val tiled = pairSet(Dedup.embeddingPairs(emb, 0.75), "vec_a", "vec_b")
    val lsh = pairSet(Dedup.embeddingPairs(emb, 0.85), "vec_a", "vec_b")
    assert(lsh.subsetOf(tiled),
      "LSH-path pairs at θ=0.85 are not a subset of the exact sweep at θ=0.75")
  }

  test("d9: every minDocs=3 span lies inside a minDocs=2 span") {
    val s2 = Dedup.spanDetect(spark, sf, 8, 2, "").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val s3 = Dedup.spanDetect(spark, sf, 8, 3, "").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = s2.groupBy(_._1)
    s3.foreach { case (doc, start, end) =>
      val hosts = byDoc.getOrElse(doc, Array.empty)
      assert(hosts.exists(h => h._2 <= start && h._3 >= end),
        s"minDocs=3 span ($doc, $start..$end) not contained in any minDocs=2 span")
    }
  }

  test("d9: every token covered by a W=9 span is covered by a W=8 span") {
    def cover(w: Int): Set[(Long, Long)] =
      Dedup.spanDetect(spark, sf, w, 2, "").collect().flatMap { r =>
        (r.getLong(1) to r.getLong(2)).map(p => (r.getLong(0), p))
      }.toSet
    val c8 = cover(8)
    val c9 = cover(9)
    assert(c9.nonEmpty, "W=9 found no spans — vacuous corpus")
    assert(c9.subsetOf(c8), "a W=9 span covers tokens no W=8 span covers")
    spark.catalog.clearCache()
  }
}
