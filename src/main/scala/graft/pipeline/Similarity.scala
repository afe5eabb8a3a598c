package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.operators.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  *   - s1: brute-force cosine top-k — the exactness baseline. Probes
  *     are broadcast against the corpus, so the scan is a single pass
  *     with no shuffle of the big side; per-probe top-k via window
  *     rank (at larger k this becomes TakeOrdered per group).
  *   - s2: random-hyperplane LSH — sign-bit bucketing with
  *     deterministic rational-arithmetic planes (exact in double, so
  *     the DuckDB oracle reproduces the buckets bit-for-bit); probes
  *     join only their own bucket: the 100 TB path, since each probe
  *     touches 1/2^bits of the corpus.
  */
object Similarity {

  private[pipeline] val dim = 64
  private val nPlanes = 4
  private val nProbes = 5
  private val topK = 10
  private val bucketK = 3

  /** plane(p)(d) — deterministic pseudo-random in [-0.5, 0.5), exact
    * rational-in-double so both engines agree bit-for-bit. */
  private def plane(p: Int, d: Int): Double = ((p * 131 + d * 137) % 997) / 997.0 - 0.5

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  private def withNorm(e: DataFrame): DataFrame =
    e.select(col("vec_id"), col("embedding"), VectorOps.norm2(col("embedding")).as("n2"))

  private def cosine(prefixA: String, prefixB: String): Column =
    VectorOps.cosineFrom(
      VectorOps.dot(col(s"$prefixA.embedding"), col(s"$prefixB.embedding")),
      col(s"$prefixA.n2"), col(s"$prefixB.n2"))

  /** Brute-force cosine top-k for probe vectors (vec_id < 5). */
  def s1_ann_brute(s: SparkSession, dir: String): DataFrame = {
    val e = withNorm(emb(s, dir))
    val probes = e.filter(col("vec_id") < nProbes)
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id"))
    broadcast(probes).as("q")
      .join(e.as("c"), col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("vec_id"),
        cosine("q", "c").as("cosine"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= topK)
  }

  // list_dot_product, not a correlated UNNEST subquery: both are the
  // same sequential double fold (bit-identical — re-proven at every
  // gate run since the oracle compare hashes doubles), but DuckDB
  // plans the correlated form ~60x slower at 10x gate scale
  private val dotSql =
    """list_dot_product(CAST(%s.embedding AS DOUBLE[]), CAST(%s.embedding AS DOUBLE[]))"""

  private val s1Sql = s"""
    WITH e AS (
      SELECT vec_id, embedding,
        list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) AS n2
      FROM embeddings),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
        ${dotSql.format("q", "c")} / SQRT(q.n2 * c.n2) AS cosine
      FROM e q JOIN e c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < $nProbes)
    SELECT query_id, vec_id, cosine, CAST(rk AS BIGINT) AS rk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY cosine DESC, vec_id) AS rk FROM pairs) x
    WHERE rk <= $topK"""

  /** Dot product of `embedding` with hyperplane `p` — a codegen'd
    * fused loop ([[graft.functions.FloatPlaneDot]]) replacing the
    * interpreted `aggregate(zip_with(...))` fold (two lambda frames
    * per element, × nPlanes evaluations per row in the bucket id);
    * bit-identical left-to-right double accumulation, so every LSH
    * bucket sign is unchanged. */
  private def planeDotSpark(p: Int): Column =
    graft.functions.FloatPlaneDot(col("embedding"),
      (0 until dim).map(d => plane(p, d)))

  private def planeDotSql(p: Int, rel: String): String = {
    val lits = (0 until dim).map(d => plane(p, d).toString).mkString(", ")
    s"""list_dot_product(CAST($rel.embedding AS DOUBLE[]), CAST([$lits] AS DOUBLE[]))"""
  }

  /** s2's hyperplane machinery, shared with [[Dedup]]'s
    * duplicate-threshold LSH candidate mode (d5 at θ ≥ 0.8 generates
    * candidates from these same deterministic planes). */
  private[pipeline] def hyperplaneDot(p: Int): Column = planeDotSpark(p)

  /** LSH bucket id: sign bit per hyperplane. */
  private def bucketSpark: Column =
    (0 until nPlanes).map(p =>
      when(planeDotSpark(p) >= 0, lit(1L << p)).otherwise(lit(0L))).reduce(_ + _)

  private def bucketSql(rel: String): String =
    (0 until nPlanes).map(p =>
      s"CASE WHEN ${planeDotSql(p, rel)} >= 0 THEN ${1L << p} ELSE 0 END").mkString(" + ")

  /** LSH-bucketed ANN: probes (vec_id < 5) retrieve top-3 by cosine
    * from their own hyperplane bucket only. */
  def s2_ann_lsh(s: SparkSession, dir: String): DataFrame = {
    val e = withNorm(emb(s, dir)).withColumn("bucket", bucketSpark)
    val probes = e.filter(col("vec_id") < nProbes)
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id"))
    broadcast(probes).as("q")
      .join(e.as("c"),
        col("q.bucket") === col("c.bucket") && col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("vec_id"),
        col("q.bucket").as("bucket"), cosine("q", "c").as("cosine"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= bucketK)
  }

  private val s2Sql = s"""
    WITH e AS (
      SELECT vec_id, embedding,
        list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) AS n2
      FROM embeddings),
    eb AS (SELECT vec_id, embedding, n2,
      CAST(${bucketSql("e")} AS BIGINT) AS bucket FROM e),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS vec_id, q.bucket AS bucket,
        ${dotSql.format("q", "c")} / SQRT(q.n2 * c.n2) AS cosine
      FROM eb q JOIN eb c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
      WHERE q.vec_id < $nProbes)
    SELECT query_id, vec_id, bucket, cosine, CAST(rk AS BIGINT) AS rk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY cosine DESC, vec_id) AS rk FROM pairs) x
    WHERE rk <= $bucketK"""

  // ---------------------------------------------------------------- s3 IVF

  private val centStride = 97
  private val nprobe = 2
  private val ivfK = 5

  /** IVF (inverted-file) ANN: centroids are the vectors at a fixed id
    * stride (deterministic, data-derived), every vector is assigned to
    * its nearest centroid (the inverted lists), and a probe searches
    * only the `nprobe` nearest lists. Centroids broadcast; the
    * assignment pass is one scan; search touches ~nprobe/nlists of the
    * corpus — the textbook IVF cost model. */
  def s3_ann_ivf(s: SparkSession, dir: String): DataFrame =
    ivfTopK(s, dir, centStride, nprobe, ivfK, nProbes, "")

  /** Parametric IVF ANN ([[s3_ann_ivf]] = the gate defaults): centroid
    * id stride, probed-list count, top-k, number of query vectors, and
    * a corpus slice predicate shared verbatim with the oracle. Fuzz
    * entry point — nprobe is the recall/cost dial every IVF deployment
    * tunes, and a slice thins both the centroid set and the lists. */
  private[graft] def ivfTopK(s: SparkSession, dir: String, stride: Int,
      np: Int, topK: Int, numQ: Int, whereSql: String): DataFrame = {
    val e0 = withNorm(emb(s, dir))
    val e = if (whereSql.isEmpty) e0 else e0.where(whereSql)
    val cents = e.filter(col("vec_id") % stride === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"), col("n2").as("cn2"))
    def centCos = VectorOps.cosineFrom(
      VectorOps.dot(col("embedding"), col("cemb")), col("n2"), col("cn2"))
    val wNearest = Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cid"))
    val assign = e.crossJoin(broadcast(cents))
      .withColumn("ccos", centCos)
      .withColumn("crk", row_number().over(wNearest))
      .filter(col("crk") === 1)
      .select(col("vec_id"), col("cid"))
    val probeLists = e.filter(col("vec_id") < numQ)
      .crossJoin(broadcast(cents))
      .withColumn("ccos", centCos)
      .withColumn("crk", row_number().over(wNearest))
      .filter(col("crk") <= np)
      .select(col("vec_id").as("query_id"), col("cid"))
    val wTop = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id"))
    probeLists
      .join(assign, "cid")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
      .distinct()
      .join(e.select(col("vec_id").as("query_id"),
        col("embedding").as("qemb"), col("n2").as("qn2")), "query_id")
      .join(e, "vec_id")
      .select(col("query_id"), col("vec_id"),
        VectorOps.cosineFrom(
          VectorOps.dot(col("qemb"), col("embedding")), col("qn2"), col("n2")).as("cosine"))
      .withColumn("rk", row_number().over(wTop).cast("long"))
      .filter(col("rk") <= topK)
  }

  private[graft] def s3SqlFor(stride: Int, np: Int, topK: Int, numQ: Int,
      whereSql: String): String = {
    val andWhere = if (whereSql.isEmpty) "" else s" WHERE $whereSql"
    s"""
    WITH e AS (
      SELECT vec_id, embedding,
        list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) AS n2
      FROM embeddings$andWhere),
    cents AS (
      SELECT vec_id AS cid, embedding AS cemb, n2 AS cn2 FROM e
      WHERE vec_id % $stride = 0),
    scored0 AS (
      SELECT e.vec_id, c.cid,
        list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(c.cemb AS DOUBLE[]))
          / SQRT(e.n2 * c.cn2) AS ccos
      FROM e CROSS JOIN cents c),
    scored AS (
      SELECT vec_id, cid,
        ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS crk
      FROM scored0),
    assign AS (SELECT vec_id, cid FROM scored WHERE crk = 1),
    probe_lists AS (
      SELECT vec_id AS query_id, cid FROM scored
      WHERE crk <= $np AND vec_id < $numQ),
    cand AS (
      SELECT DISTINCT p.query_id, a.vec_id
      FROM probe_lists p JOIN assign a ON a.cid = p.cid
      WHERE a.vec_id <> p.query_id),
    ranked AS (
      SELECT cand.query_id, cand.vec_id,
        ${dotSql.format("q", "c")} / SQRT(q.n2 * c.n2) AS cosine
      FROM cand
      JOIN e q ON q.vec_id = cand.query_id
      JOIN e c ON c.vec_id = cand.vec_id)
    SELECT query_id, vec_id, cosine, CAST(rk AS BIGINT) AS rk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY cosine DESC, vec_id) AS rk FROM ranked) x
    WHERE rk <= $topK"""
  }
  private val s3Sql = s3SqlFor(centStride, nprobe, ivfK, nProbes, "")

  /** Per-label embedding statistics: class counts, centroid
    * components (first 4 dims), mean squared norm — the "is my
    * labeled embedding corpus balanced/degenerate" health check of a
    * training pipeline. Cross-row float sums go through an exact
    * FLOOR-quantized BIGINT accumulator (`floor(x·1e10)`): the IEEE
    * double product and floor are bit-identical on every engine, so
    * the integer sum is exact, associative (⇒ identical on any
    * partitioning or cluster size), and — unlike a double→DECIMAL
    * rounding cast — free of round-HALF_UP (Spark) vs half-to-even
    * (DuckDB) divergence on dyadic `.5` ties at the target scale
    * (bit out at 1e-10 on element -0.22314453125, SCALE.md round 7).
    * Per-row norms use the codegen'd [[graft.functions.FloatVecDot]]
    * fold. One map-side-partial aggregation, shuffle key = label. */
  def s4_embed_stats(s: SparkSession, dir: String): DataFrame = {
    val q = 1e10
    def cdim(i: Int): Column =
      (sum(floor(element_at(col("embedding"), i + 1).cast("double") * lit(q)))
        .cast("double") / lit(q)).as(s"c$i")
    emb(s, dir)
      .select(col("label").cast("long").as("label"), col("embedding"),
        VectorOps.norm2(col("embedding")).as("n2"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        cdim(0), cdim(1), cdim(2), cdim(3),
        (sum(floor(col("n2") * lit(q))).cast("double") / lit(q)).as("sum_n2"))
  }

  private val s4Sql = """
    WITH norms AS (
      SELECT vec_id,
        list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS n2
      FROM embeddings e)
    SELECT CAST(e.label AS BIGINT) AS label, COUNT(*) AS n,
      CAST(CAST(SUM(CAST(FLOOR(CAST(e.embedding[1] AS DOUBLE) * 1e10) AS BIGINT)) AS STRING) AS DOUBLE) / 1e10 AS c0,
      CAST(CAST(SUM(CAST(FLOOR(CAST(e.embedding[2] AS DOUBLE) * 1e10) AS BIGINT)) AS STRING) AS DOUBLE) / 1e10 AS c1,
      CAST(CAST(SUM(CAST(FLOOR(CAST(e.embedding[3] AS DOUBLE) * 1e10) AS BIGINT)) AS STRING) AS DOUBLE) / 1e10 AS c2,
      CAST(CAST(SUM(CAST(FLOOR(CAST(e.embedding[4] AS DOUBLE) * 1e10) AS BIGINT)) AS STRING) AS DOUBLE) / 1e10 AS c3,
      CAST(CAST(SUM(CAST(FLOOR(n.n2 * 1e10) AS BIGINT)) AS STRING) AS DOUBLE) / 1e10 AS sum_n2
    FROM embeddings e JOIN norms n ON e.vec_id = n.vec_id
    GROUP BY e.label"""

  // ------------------------------------------------------------ s5 k-means

  private val kClusters = 4
  private[pipeline] val qScaleBits = 20 // coordinates quantized to 2^-20

  /** Two Lloyd iterations of k-means over the embedding corpus
    * (seed centroids = the first k vectors; k=4). Coordinates are
    * quantized once to integers (`round(x * 2^20)` — exact in double
    * because a float scaled by a power of two is exact), after which
    * EVERY step is int64 arithmetic: squared distances are in-order
    * integer folds, centroid means are exact integer sums floor-divided
    * — so the result is bit-identical on any partitioning, any engine,
    * any summation order (cross-row float sums never happen).
    *
    * Scale posture: centroids are k×d values — always broadcast; the
    * assignment pass is a single corpus scan (no shuffle of the big
    * side). The centroid recompute explodes to (vec, dim) rows but
    * groupBy(cid, dim) partially aggregates map-side, so the shuffle
    * is k·d rows per input partition regardless of corpus size. At
    * 100 TB the per-(cid,dim) int64 sum can pass 2^53 — keep it in
    * `sum(v)` (int64, exact) and only the final mean division goes
    * through double, which is exact while sums stay under 2^53 (here
    * ≤ 2^31); beyond that, switch the division to DECIMAL. */
  def s5_kmeans(s: SparkSession, dir: String): DataFrame =
    kmeansClusters(s, dir, kClusters, "")

  /** Parametric two-pass Lloyd assignment ([[s5_kmeans]] = the gate
    * defaults): seed-centroid count and a corpus slice predicate (the
    * SAME text the oracle renders into its WHERE). Fuzz entry point —
    * seeds are the surviving vectors with `vec_id < k` (NOT padded to
    * k — a residue slice with m ≤ 4 and k = 8 keeps 2 seeds, and the
    * oracle renders the same `vec_id < k` cut), so a slice that
    * excludes low ids thins the seed set identically on both engines. */
  private[graft] def kmeansClusters(s: SparkSession, dir: String,
      k: Int, whereSql: String): DataFrame = {
    val e0 = emb(s, dir)
    val q = quantized(if (whereSql.isEmpty) e0 else e0.where(whereSql))
    val c0 = q.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("qv").as("cv"))
    kmeansAssign(q, c0)
  }

  /** `(vec_id, qv)`: the embedding column quantized to int64 per
    * [[s5_kmeans]]'s arithmetic contract (round(x · 2^20) — exact in
    * double, so quantization is engine-independent). */
  private[graft] def quantized(e: DataFrame): DataFrame =
    e.select(col("vec_id"),
      expr(s"transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * ${1L << qScaleBits}.0) AS BIGINT))")
        .as("qv"))

  /** One Lloyd refinement from seed centroids `c0 (cid, cv)` over the
    * quantized corpus `q (vec_id, qv)`, returning the final assignment
    * `(vec_id, cluster, dist2)` — the body of [[s5_kmeans]], shared
    * with [[Dedup.d8_dedup_semantic]] whose centroid count scales with
    * the corpus instead of being fixed at [[kClusters]]. All-integer
    * arithmetic (see the s5 scaladoc); ties break to the smallest cid,
    * matching the oracle's `ROW_NUMBER ... ORDER BY dist, cid`. */
  private[graft] def kmeansAssign(q: DataFrame, c0: DataFrame): DataFrame = {
    def assign(cents: DataFrame): DataFrame =
      q.crossJoin(broadcast(cents))
        // codegen'd fused loop, not the HOF fold — numerically
        // identical (exact int64), ~10× throughput on the N×k hot
        // path (see LongVecDistSq)
        .withColumn("dist",
          graft.functions.LongVecDistSq(col("qv"), col("cv")))
        .groupBy("vec_id")
        .agg(min(struct(col("dist"), col("cid"))).as("best"))
        .select(col("vec_id"), col("best.cid").as("cid"), col("best.dist").as("dist"))
    val a1 = assign(c0)
    assign(lloydCentroids(q, a1))
      .select(col("vec_id"), col("cid").cast("long").as("cluster"), col("dist").as("dist2"))
  }

  /** Recompute centroids `(cid, cv)` as the per-cluster integer means
    * of `q` under assignment `a1 (vec_id, cid)` — the Lloyd update
    * step shared by the flat and hierarchical assignment paths. Exact
    * int64 sums, floor-divided once through double (see [[s5_kmeans]]'s
    * arithmetic contract); clusters that received no members simply
    * vanish (both engines agree — GROUP BY emits no row). */
  private[graft] def lloydCentroids(q: DataFrame, a1: DataFrame): DataFrame =
    q.join(a1.select("vec_id", "cid"), "vec_id")
      .select(col("cid"), posexplode(col("qv")).as(Seq("dim", "v")))
      .groupBy("cid", "dim")
      .agg(floor(sum("v").cast("double") / count(lit(1))).cast("long").as("cvd"))
      .groupBy("cid")
      .agg(expr("transform(array_sort(collect_list(struct(dim, cvd))), p -> p.cvd)").as("cv"))

  /** Hierarchical (coarse-quantized) variant of [[kmeansAssign]] for
    * centroid counts where the flat N×k assignment pass is the
    * suite's one super-linear compute stage (d8's k scales as N/256,
    * so flat assignment is O(N²/256): measured 100× cost on 10× data,
    * SCALE.md round 10). Each assignment pass becomes:
    *
    *   1. coarse quantizer = the `g` centroids with the smallest cids
    *      (g = ⌊√k⌋ at the d8 call site) — "seeds";
    *   2. every CENTROID is mapped to its nearest seed (k×g
    *      distances, ties to the smallest seed id) — the cell map;
    *   3. every VECTOR is mapped to its nearest seed (N×g);
    *   4. exact argmin only against the centroids of the vector's
    *      cell (N × mean-cell-width ≈ N×√k, ties to smallest cid).
    *
    * Total distance evaluations per pass: ~2·N·√k instead of N·k —
    * the standard IVF-over-centroids trick (SemDeDup §cost; same
    * shape as [[s3_ann_ivf]]'s probe pruning). Every vector lands in
    * a non-empty cell: a seed is at distance 0 from itself, so cell
    * `gid` owns at least its seed centroid unless an identical-vector
    * seed with a smaller id absorbs BOTH the centroid and every
    * vector that could choose it (ties break to the smaller gid on
    * both sides, so the choices are consistent).
    *
    * The result is deliberately NOT value-identical to the flat path
    * (a vector whose true nearest centroid lives outside its coarse
    * cell gets its in-cell argmin instead — the approximation IS the
    * scale trade, recall-bounded in D8SemanticSpec); the d8 oracle
    * mirrors this algorithm exactly, branch-dispatched on the same k.
    * With g ≥ k and distinct centroids it degenerates to the flat
    * assignment bit-for-bit (property-tested).
    *
    * Scale posture: seeds (g×d) and the cell-mapped centroid table
    * (k×d) are broadcast — ~400 KB at 100× gate scale; the corpus
    * shuffles only by vec_id for the two argmin groupBys (linear,
    * map-side partial). The row_number seed window is a single-task
    * sort over k rows — bounded by k ≤ N/256, trivially small next
    * to any corpus that needs this path. */
  private[graft] def kmeansAssignHier(q: DataFrame, c0in: DataFrame, g: Long): DataFrame = {
    val mad = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // centroid frames are referenced by three plan branches each
    // (seeds, cell map, fine-assign); persist so the k-row frame is
    // computed once instead of re-scanning its lineage per reference
    val c0 = c0in.persist(mad)
    def dist2(a: Column, b: Column) = graft.functions.LongVecDistSq(a, b)
    def assignH(cents: DataFrame): DataFrame = {
      val seeds = cents
        .withColumn("__r", row_number().over(Window.orderBy("cid")))
        .filter(col("__r") <= g)
        .select(col("cid").as("gid"), col("cv").as("gv"))
      val cellOf = cents.crossJoin(broadcast(seeds))
        .withColumn("gd", dist2(col("cv"), col("gv")))
        .groupBy("cid").agg(min(struct(col("gd"), col("gid"))).as("bg"))
        .select(col("cid"), col("bg.gid").as("gid"))
      val cellCents = cents.join(cellOf, "cid") // (cid, cv, gid)
      val vCell = q.crossJoin(broadcast(seeds))
        .withColumn("gd", dist2(col("qv"), col("gv")))
        .groupBy("vec_id").agg(min(struct(col("gd"), col("gid"))).as("bg"))
        .select(col("vec_id"), col("bg.gid").as("gid"))
      q.join(vCell, "vec_id")
        .join(broadcast(cellCents), "gid")
        .withColumn("dist", dist2(col("qv"), col("cv")))
        .groupBy("vec_id")
        .agg(min(struct(col("dist"), col("cid"))).as("best"))
        .select(col("vec_id"), col("best.cid").as("cid"), col("best.dist").as("dist"))
    }
    val a1 = assignH(c0)
    val c1 = lloydCentroids(q, a1).persist(mad)
    assignH(c1)
      .select(col("vec_id"), col("cid").cast("long").as("cluster"), col("dist").as("dist2"))
  }

  private[graft] def s5SqlFor(k: Int, whereSql: String): String = {
    val where = if (whereSql.isEmpty) "" else s" WHERE $whereSql"
    s"""
    WITH q AS (
      SELECT vec_id,
        LIST_TRANSFORM(embedding,
          x -> CAST(ROUND(CAST(x AS DOUBLE) * ${1L << qScaleBits}.0) AS BIGINT)) AS qv
      FROM embeddings$where),
    c0 AS (SELECT vec_id AS cid, qv AS cv FROM q WHERE vec_id < $k),
    d1 AS (
      SELECT q.vec_id, c.cid,
        (SELECT SUM((x - y) * (x - y))
         FROM (SELECT UNNEST(q.qv) AS x, UNNEST(c.cv) AS y) z) AS dist
      FROM q CROSS JOIN c0 c),
    a1 AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
        FROM d1) x WHERE rk = 1),
    m1 AS (
      SELECT a1.cid, e.dim,
        CAST(FLOOR(CAST(SUM(e.v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cvd
      FROM (SELECT vec_id, UNNEST(range(1, $dim + 1)) AS dim, UNNEST(qv) AS v
            FROM q WHERE qv IS NOT NULL) e
      JOIN a1 ON a1.vec_id = e.vec_id
      GROUP BY a1.cid, e.dim),
    c1 AS (SELECT cid, LIST(cvd ORDER BY dim) AS cv FROM m1 GROUP BY cid),
    d2 AS (
      SELECT q.vec_id, c.cid,
        (SELECT SUM((x - y) * (x - y))
         FROM (SELECT UNNEST(q.qv) AS x, UNNEST(c.cv) AS y) z) AS dist
      FROM q CROSS JOIN c1 c)
    SELECT vec_id, CAST(cid AS BIGINT) AS cluster, CAST(dist AS BIGINT) AS dist2
    FROM (SELECT vec_id, cid, dist,
            ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
          FROM d2) x
    WHERE rk = 1"""
  }
  private val s5Sql = s5SqlFor(kClusters, "")

  // ------------------------------------------------------------ s6 PQ

  private val pqM = 8        // subspaces
  private val pqSubDim = dim / pqM
  private val pqK = 16       // codebook entries per subspace
  private val pqProbes = 3

  /** Product-quantization ANN: each vector is compressed to `pqM`
    * codebook indices (one per 8-dim subspace; codebooks are the
    * quantized subvectors of the first `pqK` vectors — deterministic
    * seeds, same device as s3/s5), and query-to-candidate distance is
    * answered entirely from the codes via an ADC table (per-subspace
    * query→centroid distances, summed by code lookup).
    *
    * Scale story: the codes table IS the index — 8 small ints per
    * vector instead of a 256-byte embedding (32× compression), built
    * once with one shuffle sized to the codes, reusable across every
    * query. A query touches codebook-sized broadcast state plus one
    * aggregation over candidate codes; the raw embeddings are never
    * re-scanned at query time — that is what makes billion-vector ANN
    * serving from Spark state possible. All arithmetic is exact int64
    * on 2^-20-quantized coordinates, so the DuckDB oracle matches
    * bit-for-bit. */
  def s6_ann_pq(s: SparkSession, dir: String): DataFrame = {
    val q = emb(s, dir).select(col("vec_id"),
      expr(s"transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * ${1L << qScaleBits}.0) AS BIGINT))")
        .as("qv"))
    val subs = q.select(col("vec_id"), explode(expr(
        s"transform(sequence(0, ${pqM - 1}), m -> struct(m AS m, slice(qv, m * $pqSubDim + 1, $pqSubDim) AS sv))"))
        .as("e"))
      .select(col("vec_id"), col("e.m").as("m"), col("e.sv").as("sv"))
    val codebook = subs.filter(col("vec_id") < pqK)
      .select(col("m"), col("vec_id").as("k"), col("sv").as("cv"))
    // codegen'd fused loop (LongVecDistSq) instead of the interpreted
    // HOF fold — numerically identical exact int64 (the s5/d8
    // assignment-path precedent); this expression runs 16×8×N times
    // in the encode pass, s6's hot loop.
    val sqDist = graft.functions.LongVecDistSq(col("sv"), col("cv"))
    // Encode the corpus: nearest codebook entry per (vector, subspace).
    val codes = subs.join(broadcast(codebook), "m")
      .withColumn("dist", sqDist)
      .groupBy("vec_id", "m")
      .agg(min(struct(col("dist"), col("k"))).as("best"))
      .select(col("vec_id"), col("m"), col("best.k").as("k"))
    // ADC tables: per-probe, per-subspace distance to every centroid.
    val qt = subs.filter(col("vec_id") < pqProbes)
      .select(col("vec_id").as("query_id"), col("m"), col("sv"))
      .join(broadcast(codebook), "m")
      .withColumn("qdist", sqDist)
      .select("query_id", "m", "k", "qdist")
    val w = Window.partitionBy("query_id").orderBy(col("approx_dist"), col("vec_id"))
    codes.join(broadcast(qt), Seq("m", "k"))
      .filter(col("query_id") =!= col("vec_id"))
      .groupBy("query_id", "vec_id")
      .agg(sum("qdist").as("approx_dist"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= topK)
  }

  private val s6Sql = s"""
    WITH q AS (
      SELECT vec_id,
        LIST_TRANSFORM(embedding,
          x -> CAST(ROUND(CAST(x AS DOUBLE) * ${1L << qScaleBits}.0) AS BIGINT)) AS qv
      FROM embeddings),
    subs AS (
      SELECT vec_id, m, qv[m * $pqSubDim + 1 : m * $pqSubDim + $pqSubDim] AS sv
      FROM (SELECT vec_id, qv, UNNEST(range($pqM)) AS m FROM q) a),
    cb AS (SELECT m, vec_id AS k, sv AS cv FROM subs WHERE vec_id < $pqK),
    enc AS (
      SELECT vec_id, m, k FROM (
        SELECT s.vec_id, s.m, c.k,
          ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m ORDER BY
            (SELECT SUM((x - y) * (x - y))
             FROM (SELECT UNNEST(s.sv) AS x, UNNEST(c.cv) AS y) z), c.k) AS rk
        FROM subs s JOIN cb c USING (m)) x
      WHERE rk = 1),
    qt AS (
      SELECT s.vec_id AS query_id, s.m, c.k,
        (SELECT CAST(SUM((x - y) * (x - y)) AS BIGINT)
         FROM (SELECT UNNEST(s.sv) AS x, UNNEST(c.cv) AS y) z) AS qdist
      FROM subs s JOIN cb c USING (m)
      WHERE s.vec_id < $pqProbes),
    cand AS (
      SELECT qt.query_id, enc.vec_id, CAST(SUM(qt.qdist) AS BIGINT) AS approx_dist
      FROM enc JOIN qt ON enc.m = qt.m AND enc.k = qt.k
      WHERE qt.query_id <> enc.vec_id
      GROUP BY 1, 2)
    SELECT query_id, vec_id, approx_dist, CAST(rk AS BIGINT) AS rk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY approx_dist, vec_id) AS rk FROM cand) x
    WHERE rk <= $topK"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_ann_brute" -> (s1_ann_brute _),
    "s2_ann_lsh" -> (s2_ann_lsh _),
    "s3_ann_ivf" -> (s3_ann_ivf _),
    "s4_embed_stats" -> (s4_embed_stats _),
    "s5_kmeans" -> (s5_kmeans _),
    "s6_ann_pq" -> (s6_ann_pq _))

  val oracle: Map[String, String] = Map(
    "s1_ann_brute" -> s1Sql,
    "s2_ann_lsh" -> s2Sql,
    "s3_ann_ivf" -> s3Sql,
    "s4_embed_stats" -> s4Sql,
    "s5_kmeans" -> s5Sql,
    "s6_ann_pq" -> s6Sql)
}
