package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorOps
import graft.pipeline.{Dedup, Similarity}

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
    info(s"flat recall=$recall ($within/$exact within-cluster of exact pairs)")
    // this corpus: 500 vecs, 66 exact pairs; the k-means partition keeps
    // half of them co-clustered (measured 0.50 = 33/66, stable across
    // rounds 10-11 — the floor is pinned just under it so a quality
    // regression in the assignment fails here instead of shipping).
    // A broken seed filter collapsing to 1 centroid would push recall
    // to 1.0 but blow the cluster-size bound below; random assignment
    // would push it to ~1/k.
    assert(recall >= 0.4, s"cluster-restriction recall collapsed: $recall")
  }

  // ---- hierarchical assignment (the k > d8FlatMaxK scale path) ----

  private lazy val q = Similarity.quantized(
    graft.operators.Tables.load(spark, sf, "embeddings"))

  /** First-k quantized vectors as seed centroids, like d8/s5. */
  private def seedCents(k: Long): DataFrame =
    q.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("qv").as("cv"))

  test("hierarchical assignment with g >= k degenerates to the flat path bit-for-bit") {
    // with one cell per centroid the coarse step IS the exact argmin,
    // so hier ≡ flat exactly (distinct seed vectors on this corpus) —
    // the property that pins the two paths to one algorithm family
    val k = 8L
    val flat = Similarity.kmeansAssign(q, seedCents(k))
    val hier = Similarity.kmeansAssignHier(q, seedCents(k), g = k)
    assert(hier.exceptAll(flat).count() === 0)
    assert(flat.exceptAll(hier).count() === 0)
  }

  test("hierarchical assignment invariants at realistic g = floor(sqrt(k))") {
    val k = 8L
    val hier = Similarity.kmeansAssignHier(q, seedCents(k), g = 2L).cache()
    val n = q.count()
    assert(hier.count() === n, "every vector assigned exactly once")
    assert(hier.select("cluster").distinct().count() > 1L,
      "coarse cells must not collapse the clustering")
    // cluster ids live in the seed-centroid id space (Lloyd update
    // keeps cids, it only moves the vectors)
    assert(hier.filter(col("cluster") < 0 || col("cluster") >= k).count() === 0)
    assert(hier.filter(col("dist2") < 0).count() === 0)
  }

  test("hier-path recall vs the exact sweep stays above the pinned floor") {
    // Item guarded: the hierarchical rewrite must not silently degrade
    // clustering quality. Force the hier path on the spec corpus
    // (gate-scale d8 dispatches flat here) and measure the same
    // cluster-restricted recall as the flat test. Measured at spec
    // time: flat 0.50 (33/66), hier(g=2) 0.576 (38/66) — the coarse
    // quantization does NOT degrade this corpus; the floor is pinned
    // just under the measured value so a future change that does
    // degrade it fails here.
    val k = math.max(4L, math.ceil(q.count() / 256.0).toLong)
    val g = math.max(1L, math.floor(math.sqrt(k.toDouble)).toLong)
    val hier = Similarity.kmeansAssignHier(q, seedCents(k), g)
    val j = hier.join(emb, Seq("vec_id"))
    val within = j.as("x").join(j.as("y"),
        col("x.cluster") === col("y.cluster") &&
          col("x.vec_id") < col("y.vec_id"))
      .withColumn("cosine", VectorOps.cosineFrom(
        VectorOps.dot(col("x.embedding"), col("y.embedding")),
        col("x.n2"), col("y.n2")))
      .filter(col("cosine") >= 0.4)
      .count()
    val exact = Dedup.embeddingPairs(emb, 0.4).count()
    val recall = within.toDouble / exact
    info(s"hier recall=$recall ($within/$exact within-cluster of exact pairs)")
    assert(recall >= 0.45, s"hier cluster-restriction recall collapsed: $recall")
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
