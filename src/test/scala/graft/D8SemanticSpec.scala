package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorOps
import graft.pipeline.Dedup

/** d8 semantic dedup (SemDeDup-shaped): invariants of the drop rule
  * plus a MEASURED recall of the cluster restriction against the exact
  * all-pairs sweep — the approximation is the design (cluster-then-
  * search is what makes the op linear at scale), so the spec pins how
  * much it gives up on this corpus instead of assuming it away. Value
  * equality vs the DuckDB oracle is the driver's gate (hash-green at
  * sf0.01/sf0.1/sf1p when this spec was written). */
class D8SemanticSpec extends AnyFunSuite {
  import TestSession._

  private lazy val out: DataFrame =
    Dedup.d8_dedup_semantic(spark, sf).cache()

  private lazy val emb: DataFrame =
    graft.operators.Tables.load(spark, sf, "embeddings")
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"),
        VectorOps.norm2(col("embedding")).as("n2"))

  /** Exact within-cluster near-dup pairs at d8's θ, recomputed
    * independently of bucketPairs (plain self-join on cluster). */
  private lazy val clusterPairs: DataFrame = {
    val j = out.join(emb, Seq("vec_id"))
    j.as("x").join(j.as("y"),
        col("x.cluster") === col("y.cluster") &&
          col("x.vec_id") < col("y.vec_id"))
      .withColumn("cosine", VectorOps.cosineFrom(
        VectorOps.dot(col("x.embedding"), col("y.embedding")),
        col("x.n2"), col("y.n2")))
      .filter(col("cosine") >= 0.4)
      .select(col("x.vec_id").as("va"), col("y.vec_id").as("vb"),
        col("x.dist2").as("da"), col("y.dist2").as("db"))
      .cache()
  }

  test("d8 output is a partition of the corpus with a nonempty drop set") {
    val n = graft.operators.Tables.load(spark, sf, "embeddings").count()
    assert(out.count() === n)
    val dropped = out.filter(col("dropped")).count()
    assert(dropped > 0, "corpus has near-dup pairs; the drop set can't be empty")
    assert(dropped < n, "the drop rule keeps a representative per neighborhood")
  }

  test("the centroid-nearest member of every cluster survives") {
    val best = out.withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("cluster")
          .orderBy(col("dist2"), col("vec_id"))))
      .filter(col("rk") === 1)
    assert(best.filter(col("dropped")).count() === 0)
  }

  test("drop rule soundness and completeness vs an independent pair recompute") {
    // losers per the rule, recomputed from the plain cluster self-join
    val expected = clusterPairs.select(
        when(col("da") > col("db") ||
          (col("da") === col("db") && col("va") > col("vb")),
          col("va")).otherwise(col("vb")).as("vec_id"))
      .distinct()
    val got = out.filter(col("dropped")).select("vec_id")
    assert(got.exceptAll(expected).count() === 0, "false drop")
    assert(expected.exceptAll(got).count() === 0, "missed drop")
  }

  test("cluster restriction recall vs the exact sweep is measured, not assumed") {
    val exact = Dedup.embeddingPairs(emb, 0.4).count()
    val within = clusterPairs.count()
    assert(within <= exact)
    val recall = within.toDouble / exact
    // this corpus: 500 vecs, 66 exact pairs; the k-means partition keeps
    // about half of them co-clustered. The floor guards regressions in
    // the assignment (e.g. a broken seed filter collapsing to 1 centroid
    // would push recall to 1.0 but blow the cluster-size bound below;
    // random assignment would push it to ~1/k).
    assert(recall >= 0.3, s"cluster-restriction recall collapsed: $recall")
  }

  test("cluster widths stay near the target (the linear-scale invariant)") {
    val widths = out.groupBy("cluster").count()
    val maxW = widths.agg(max("count")).head.getLong(0)
    // k = max(4, N/256) targets ~256/cluster; allow imbalance but fail
    // if one cluster swallows the corpus (the N² failure mode)
    val n = out.count()
    assert(maxW < n, "one cluster swallowed the corpus")
    assert(widths.count() >= 4, "fewer clusters than the k floor")
  }
}
