package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{VectorOps, WindowHashes}
import graft.operators.Tables

/** Deduplication family over `documents` / `embeddings` — the core
  * operators of a large-scale training-data pipeline:
  *
  *   - d1 exact:     hash-group by content digest (md5)
  *   - d2 n-gram:    exact Jaccard over *rare* 5-grams (document
  *                   frequency cut bounds the gram-join fan-out, so the
  *                   candidate-pair count stays ~linear at scale —
  *                   common grams can never pair O(N²) documents)
  *   - d3 MinHash:   16 permutations → 4 bands × 4 rows LSH; candidate
  *                   pairs from band equality, scored by signature
  *                   agreement (est. Jaccard) ≥ 0.75
  *   - d4 SimHash:   30-bit sign-sketch of the gram set; pairs with
  *                   Hamming distance ≤ 3
  *   - d5 embedding: cosine near-dup pairs ≥ 0.4 (brute force here;
  *                   the LSH-bucketed scale path is
  *                   [[Similarity.s2_ann_lsh]])
  *
  * Every op is deterministic integer/double arithmetic mirrored
  * exactly by its DuckDB oracle (see [[Hashing]]).
  */
object Dedup {

  import Hashing._

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
  /** `documents` under an optional SQL predicate — the SAME text the
    * oracle renders into its WHERE clause (fuzz corpus slices). */
  /** Corpus under an optional slice and an optional text-column
    * transform (PipeFuzz's NULL-text lane): `textSql` is a scalar SQL
    * expression replacing the text column — the SAME string the
    * oracle renders via [[TextAnalysis.corpusRef]], so both engines
    * see an identical corpus. Default is the identity (no extra
    * projection — gate plans unchanged). */
  private def slicedDocs(s: SparkSession, dir: String, whereSql: String,
      textSql: String = "text"): DataFrame = {
    val d0 = docs(s, dir)
    val d = if (textSql == "text") d0 else d0.withColumn("text", expr(textSql))
    if (whereSql.isEmpty) d else d.where(whereSql)
  }
  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  // ------------------------------------------------------------ d1 exact

  /** Exact dedup: group by content digest, keeper = min doc_id.
    * Partitioning by the fixed-width digest (not the full text) keeps
    * shuffle keys small at 100 TB scale. */
  def d1_dedup_exact(s: SparkSession, dir: String): DataFrame =
    exactDedup(s, dir, "")

  /** Parametric exact dedup over a SQL-predicate corpus slice
    * ([[d1_dedup_exact]] = no slice); fuzz entry point. */
  private[graft] def exactDedup(s: SparkSession, dir: String,
      whereSql: String, textSql: String = "text"): DataFrame = {
    val w = Window.partitionBy("text_hash")
    slicedDocs(s, dir, whereSql, textSql)
      .withColumn("text_hash", md5(col("text").cast("binary")))
      .select(col("doc_id"), col("text_hash"),
        min(col("doc_id")).over(w).as("keeper_id"),
        count(lit(1)).over(w).as("n_copies"))
      .withColumn("is_dup", (col("doc_id") =!= col("keeper_id")).cast("int"))
  }

  private[graft] def d1SqlFor(whereSql: String,
      textSql: String = "text"): String = {
    val where = if (whereSql.isEmpty) "" else s" WHERE $whereSql"
    s"""
    SELECT doc_id, md5(text) AS text_hash,
      MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper_id,
      COUNT(*) OVER (PARTITION BY md5(text)) AS n_copies,
      CAST(doc_id <> MIN(doc_id) OVER (PARTITION BY md5(text)) AS INT) AS is_dup
    FROM ${TextAnalysis.corpusRef(textSql)}$where"""
  }
  private val d1Sql = d1SqlFor("")

  // ------------------------------------------------------------ d2 n-gram

  /** Gate-scale floor of d2's rare-gram cut: df ≤ max(25, N/[[d2DfShare]]).
    * 25 keeps sf0.01/sf0.1 results bit-identical to rounds 7–10 (the
    * fractional term is < 25 there); above gate scale the FRACTIONAL
    * term takes over — the test corpus has a FIXED ~2k-gram vocabulary,
    * so every gram's df grows ∝ N and a constant ceiling empties the
    * rare set (round 10's gate compared two empty sets at sf10p,
    * leaving the suite's heaviest gram join unexercised exactly where
    * scale bugs live). */
  private[graft] val d2MaxDf = 25L

  /** Scale-relative share for d2's rarity cut: a gram is "rare" when
    * it appears in ≤ N/500 documents (0.2% of the corpus). Because
    * df ∝ N on a bounded vocabulary, the SAME grams qualify at every
    * scale — the cut's semantics are scale-invariant, and per-gram
    * fan-out is bounded by C(N/500, 2) per gram, which the
    * [[bucketPairs]] tiling spreads across tasks once a gram bucket
    * outgrows [[d3ChunkSize]] (measured: cut 100 at sf1p → 235k
    * candidate pairs, cut 1000 at sf10p → 29.7M — linear-ish in N and
    * minutes of oracle work, vs the uncapped N/20 cut's quadratic
    * blow-up in round 7). */
  private[graft] val d2DfShare = 500L

  /** Exact Jaccard over rare grams (df ≤ max(25, N/500)): near-dup
    * pairs share most of their rare grams; unrelated docs share only
    * common vocabulary grams, which the df cut removes. See
    * [[d2MaxDf]]/[[d2DfShare]] for the cut's scale story. */
  def d2_dedup_ngram(s: SparkSession, dir: String): DataFrame =
    ngramPairs(s, dir, d2MaxDf, d2DfShare, "0.5", "")

  /** Parametric rare-gram Jaccard pairs ([[d2_dedup_ngram]] = the gate
    * defaults): df cut = max(maxDf, N div dfShare), Jaccard ≥ theta
    * (passed as a literal string so both engines parse the same
    * decimal), corpus under `whereSql`. Fuzz entry point — varying
    * dfShare swings rare-set density across the bucketPairs dispatch. */
  private[graft] def ngramPairs(s: SparkSession, dir: String, maxDf: Long,
      dfShare: Long, theta: String, whereSql: String,
      textSql: String = "text"): DataFrame = {
    val g = TextAnalysis.gramCodes(slicedDocs(s, dir, whereSql, textSql))
    // EXACT integer division (count div dfShare): a double multiply
    // would truncate in Spark but ROUND in DuckDB's decimal-to-bigint
    // cast — the two engines would disagree on boundary counts
    val nDocs = slicedDocs(s, dir, whereSql).select(
      greatest(lit(maxDf), expr(s"count(1) div $dfShare")).as("cut"))
    // Document frequency as ONE window over the cached gram table
    // (one exchange by code + sort) instead of groupBy-then-join-back
    // (two exchanges of the full gram table + SMJ sorts) — identical
    // df per (doc_id, code) row, one fewer shuffle of the widest
    // table in the pipeline. (r15 probe: a groupBy + shuffled-hash
    // join-back — same exchange, no sort — measured 18% SLOWER at
    // sf0.1; r16 re-probe AT SCALE on the maximal-skew sf1p corpus:
    // window 3.71 s vs join-back 3.94 s — the window wins on the skew
    // shape too, because the join-back recomputes the gram explode
    // for the df side.)
    val rare = g.withColumn("df",
        count(lit(1)).over(Window.partitionBy("code")))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") <= col("cut"))
      .select("doc_id", "code")
      // referenced three times (sizes + both self-join sides)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = rare.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    // Within-gram pair enumeration through bucketPairs: identical to a
    // plain self-equi-join on `code` while no gram bucket exceeds
    // d3ChunkSize (every corpus up to ~sf10p, where the widest rare
    // gram holds ≤ N/500 = 1000 docs), and tiles wider buckets across
    // tasks beyond that — the same LSH hot-bucket discipline as d3/d4,
    // needed here because the scale-relative cut lets bucket width
    // grow ∝ N instead of being constant-capped.
    val common = bucketPairs(rare, Seq("code"), "doc_id", d3ChunkSize,
        s"d2:$dir:$maxDf:$dfShare:$whereSql:$textSql:${corpusStamp(s, dir, "documents")}")
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("nb")), "doc_b")
      .withColumn("jaccard", col("common") / (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= expr(theta))
      .select("doc_a", "doc_b", "common", "na", "nb", "jaccard")
      // the pair set is orders of magnitude smaller than the corpus but
      // its plan is the whole multi-shuffle pipeline above; persist so
      // consumers (d6's anti-join, a d2-then-d6 session) hit the cache
      // via canonical-plan matching instead of re-running the pipeline.
      // The bench clears the cache at the start of every timed pass, so
      // d2's recorded time is always the full pipeline, never a cache
      // scan left over from warmup/pass 1 — while d6 (which runs after
      // d2 within a pass) still measures its intended cache-reuse shape.
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  // g and rare are MATERIALIZED: each is referenced 2–3 times and
  // DuckDB inlines multiply-referenced CTEs, re-running the gram
  // explode per reference — harmless when the rare set was empty at
  // big SF (rounds 7–10), ruinous now that the scale-relative cut
  // keeps it populated (the sf10p rare set is ~69k rows from a 1G
  // char explode).
  private[graft] def d2SqlFor(maxDf: Long, dfShare: Long, theta: String,
      whereSql: String, textSql: String = "text"): String = {
    val docWhere = if (whereSql.isEmpty) "" else s" WHERE $whereSql"
    s"""
    WITH g AS MATERIALIZED (${TextAnalysis.gramSqlFor(whereSql, textSql)}),
    cutoff AS (SELECT GREATEST($maxDf, COUNT(*) // $dfShare) AS cut FROM documents$docWhere),
    rare AS MATERIALIZED (
      SELECT g.doc_id, g.code FROM g
      JOIN (SELECT code, COUNT(*) AS df FROM g GROUP BY code) d ON g.code = d.code
      CROSS JOIN cutoff WHERE d.df <= cut),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM rare GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
      FROM rare a JOIN rare b ON a.code = b.code AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT doc_a, doc_b, common, sa.sz AS na, sb.sz AS nb,
      common / (sa.sz + sb.sz - common) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE common / (sa.sz + sb.sz - common) >= $theta"""
  }
  private val d2Sql = d2SqlFor(d2MaxDf, d2DfShare, "0.5", "")

  /** Apply the dedup decision: drop every document that loses a
    * near-dup pairing (doc_b of a Jaccard ≥ 0.5 pair — the keeper is
    * the smaller doc_id), emitting the cleaned corpus. This is the
    * pipeline's terminal stage: candidate generation → verification →
    * keeper selection → anti-join. */
  def d6_dedup_apply(s: SparkSession, dir: String): DataFrame = {
    // d2's output is persisted (see d2_dedup_ngram): the anti-join
    // reads the cached pair table — materialized at most once per
    // session — so this query's own work is one distinct plus the
    // anti-join, not a re-run of the 8-shuffle pair pipeline. AQE picks
    // broadcast for the loser side from runtime stats at this scale
    // and falls back to a shuffled anti-join when the dup set is big.
    // no distinct on the loser side: LEFT ANTI ignores right-side
    // duplicates, so deduplicating them first is a pure extra exchange
    val losers = d2_dedup_ngram(s, dir).select(col("doc_b").as("doc_id"))
    docs(s, dir)
      .join(losers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
  }

  private val d6Sql = s"""
    WITH pairs AS ($d2Sql)
    SELECT doc_id, lang, source, n_chars FROM documents
    WHERE doc_id NOT IN (SELECT doc_b FROM pairs)"""

  // ------------------------------------------------------------ d3 MinHash

  private val nPerm = 16
  private val bandRows = 4
  private val nBands = nPerm / bandRows

  /** Chunk width for [[bucketPairs]]' hot-bucket tiling. 1024 keeps
    * every tile at ≤ ~1M signature comparisons (ms of work) while a
    * 32k-wide bucket still fans out into ~500 tiles; the sf1p standing
    * scale gate (widest bucket 3221) exercises the hot path. */
  private[graft] val d3ChunkSize = 1024

  /** Distributed within-bucket pair enumeration — the LSH hot-bucket
    * skew fix. A plain self-equi-join on the bucket key puts each
    * bucket's C(w,2) pair fan-out in ONE task (the key is the
    * partition), and AQE cannot split it: skew detection sizes on
    * exchange INPUT (w rows — tiny), not on an explosive join's
    * output. On the low-entropy test corpus the widest MinHash band
    * bucket grows linearly with N (328 at sf0.1 → 3221 at sf1p), so
    * the one-task pair volume grows ~N² — at sf10p a single task ran
    * 970+ s of CPU while 31 cores idled.
    *
    * Buckets wider than `chunkSize` (rare by construction) are split
    * into rank-ordered chunks; each unordered chunk pair (ca ≤ cb)
    * becomes one tile, tagged onto both sides via a broadcast of the
    * small tile table, and the tile id joins the shuffle key — so a
    * width-w bucket's pairs spread over (w/chunkSize)² tasks of ≤
    * chunkSize² comparisons. Buckets at or under `chunkSize` keep
    * the plain bucket-key join (the common case — identical shape to
    * before, so small scales are untouched). Output is exactly every
    * unordered in-bucket pair with `a.orderCol < b.orderCol`, each
    * once, as struct columns `a`/`b` carrying the non-bucket payload:
    * a pair u<v in chunks cu ≤ cv appears in exactly tile (cu, cv)
    * (same-chunk tiles keep rank order strict). `orderCol` must be
    * unique within a bucket (each doc lands in a band bucket once). */
  /** Memoized hot-bucket dispatch decisions, keyed by the caller's
    * corpus identity (+ chunkSize): the probe that decides plain-vs-
    * tiled is a real Spark job (~2 s warm at sf0.1 — it aggregates the
    * full band table), and Verify/Bench build the same query against
    * the same immutable corpus many times per session. Memoizing is
    * sound because BOTH branches are output-identical — the decision
    * only selects a plan — and the test corpora never mutate under a
    * running session. Cleared by nothing: one entry per (corpus,
    * caller) string, a few dozen per JVM at most. */
  private val hotProbeMemo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** Last dispatch decision [[bucketPairs]] took (diagnostics/tests:
    * memo invalidation on corpus growth must flip this in-JVM). */
  @volatile private[graft] var lastDispatchHot: Boolean = false

  /** The persisted `tagged` frame per probe key: re-entering the hot
    * path for the same corpus (repeated builds in a bench/REPL
    * session) unpersists the PREVIOUS materialization before creating
    * the next, so cached blocks don't accumulate until context
    * shutdown. One live entry per (corpus, caller) at most. */
  private val taggedCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** Cheap content stamp of `dir/table.parquet` (total bytes + max
    * mtime below the path). Folded into the hot-probe memo key by the
    * dir-keyed callers so a corpus APPEND invalidates the memoized
    * dispatch — a corpus that grows a hot bucket after the first
    * probe must re-probe, not keep the plain plan and re-create the
    * straggler the tiling exists to kill. */
  private[graft] def corpusStamp(s: SparkSession, dir: String, table: String): String =
    try {
      val p = new org.apache.hadoop.fs.Path(s"$dir/$table.parquet")
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      val cs = fs.getContentSummary(p)
      val mt = fs.getFileStatus(p).getModificationTime
      s"${cs.getLength}:$mt"
    } catch { case _: Exception => "na" }

  private[graft] def bucketPairs(banded: DataFrame, bucketCols: Seq[String],
      orderCol: String, chunkSize: Int, probeKey: String): DataFrame = {
    val bcols = bucketCols.map(col)
    val payload = banded.columns.filterNot(bucketCols.contains).toSeq
    def side(j: String) = struct(payload.map(p => col(s"$j.$p").as(p)): _*)
    def onBucket(x: String, y: String) =
      bucketCols.map(cn => col(s"$x.$cn") === col(s"$y.$cn")).reduce(_ && _)
    def selfPairs(df: DataFrame): DataFrame = df.as("x").join(df.as("y"),
        onBucket("x", "y") && col(s"x.$orderCol") < col(s"y.$orderCol"))
      .select(side("x").as("a"), side("y").as("b"))
    val hotKeys = banded.groupBy(bcols: _*).agg(count(lit(1)).as("__w"))
      .filter(col("__w") > chunkSize)
      .select(bcols :+ lit(true).as("__hot"): _*)
    // Adaptive dispatch: one bounded driver-side probe (an aggregate
    // over `banded`, which derives from the caller's persisted
    // signature table — the probe is what materializes that cache, so
    // the gram pipeline still runs exactly once), memoized per corpus.
    // When NO bucket exceeds chunkSize — every corpus below ~10× gate
    // scale — the plan is the plain bucket-key self-join, identical to
    // the pre-tiling shape: the tiling machinery costs ~10 extra
    // stages (window sort, persist materialization, empty hot branch)
    // that measured 4× wall on d3 at sf0.1 while buying nothing.
    val anyHot = hotProbeMemo.computeIfAbsent(s"$probeKey:$chunkSize",
      _ => !hotKeys.isEmpty)
    lastDispatchHot = anyHot
    if (!anyHot) return selfPairs(banded)
    // ONE broadcast left join tags hot-bucket rows, ONE window ranks
    // them, and the result is persisted: the cold self-join's two
    // sides, the tile table, and the hot join's two sides all filter
    // this single materialization. (A first cut re-derived the band
    // union per branch — 12 instantiations, 49 cache scans, 34
    // unshared exchanges, 3× wall at sf1p — classic DAG-reuse-vs-
    // recompute; hotKeys itself stays unpersisted: one broadcast.)
    val w = Window.partitionBy(bcols: _*).orderBy(col(orderCol))
    val tagged = banded.join(broadcast(hotKeys), bucketCols, "left")
      .withColumn("__rnk", row_number().over(w).cast("long") - 1)
      .withColumn("__chunk", (col("__rnk") / chunkSize).cast("int"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // release the PREVIOUS build's materialization for this corpus
    // (blocking=false: lazily, off the query path)
    Option(taggedCache.put(s"$probeKey:$chunkSize", tagged))
      .foreach(_.unpersist(false))
    // cold path: plain bucket-key self-join, per-key fan-out ≤ C(chunkSize,2)
    val coldPairs = selfPairs(tagged.filter(col("__hot").isNull))
    // hot path: tile the chunk grid
    val hw = tagged.filter(col("__hot"))
    val tiles = hw.groupBy(bcols: _*).agg(max(col("__chunk")).as("__maxc"))
      .withColumn("__ca", explode(sequence(lit(0), col("__maxc"))))
      .withColumn("__cb", explode(sequence(col("__ca"), col("__maxc"))))
      .drop("__maxc")
    def sideT(chunkOf: String) = hw.as("l").join(broadcast(tiles.as("c")),
        onBucket("l", "c") && col(s"c.$chunkOf") === col("l.__chunk"))
      .select(bucketCols.map(cn => col(s"l.$cn")) ++
        payload.map(p => col(s"l.$p")) ++
        Seq(col("l.__rnk"), col("c.__ca"), col("c.__cb")): _*)
    val hotPairs = sideT("__ca").as("x").join(sideT("__cb").as("y"),
        onBucket("x", "y") &&
          col("x.__ca") === col("y.__ca") && col("x.__cb") === col("y.__cb"))
      .filter(col("x.__ca") < col("x.__cb") || col("x.__rnk") < col("y.__rnk"))
      .select(side("x").as("a"), side("y").as("b"))
    coldPairs.unionAll(hotPairs)
  }

  /** MinHash + LSH banding: signature agreement ≥ 0.75 on
    * band-collision candidates. Candidates come from equality joins on
    * the 4 per-band minhash columns — a shuffle join on narrow int
    * keys, which is the scalable formulation (no pairwise scan) —
    * with hot buckets tiled across tasks by [[bucketPairs]].
    *
    * The full 16-perm signature rides along through the band join so
    * agreement is verified INLINE, before the pair distinct: the
    * distinct then dedups only verified pairs (~0.2% of band
    * collisions on the test corpus) instead of the full candidate
    * volume, and the two post-candidate signature re-joins disappear.
    * Output-identical to the candidates-then-verify formulation (the
    * DuckDB oracle keeps that shape): est_jaccard is a pure function
    * of the pair, so filter-then-distinct ≡ distinct-then-filter. */
  def d3_dedup_minhash(s: SparkSession, dir: String): DataFrame =
    minhashPairs(s, dir, "0.75", "")

  /** Parametric MinHash pairs ([[d3_dedup_minhash]] = the gate
    * defaults): signature agreement ≥ theta (literal string, parsed
    * identically by both engines) over a corpus slice. Bands/perms
    * stay fixed — they define the sketch; the agreement cut and the
    * corpus are the run-time knobs a user would turn. */
  private[graft] def minhashPairs(s: SparkSession, dir: String,
      theta: String, whereSql: String, textSql: String = "text"): DataFrame = {
    val bands = minhashBands(s, dir, whereSql, textSql)
    bucketPairs(bands, Seq("band", "h1", "h2", "h3", "h4"), "doc_id",
        d3ChunkSize, s"d3:$dir:$whereSql:$textSql:${corpusStamp(s, dir, "documents")}")
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        minhashAgree.as("est_jaccard"))
      .filter(col("est_jaccard") >= expr(theta))
      .distinct()
  }

  /** Signature agreement fraction between the `a`/`b` sides of a band
    * join — shared by d3's self-join and d11's train×eval join. */
  private def minhashAgree: Column = (1 to nPerm)
    .map(j => when(col(s"a.m$j") === col(s"b.m$j"), 1).otherwise(0))
    .reduce(_ + _).cast("double") / nPerm

  /** The MinHash band table `(doc_id, m1..m16, band, h1..h4)` —
    * d3's candidate machinery, shared with [[fuzzyDecontaminate]]. */
  private[graft] def minhashBands(s: SparkSession, dir: String,
      whereSql: String, textSql: String = "text"): DataFrame = {
    val g = TextAnalysis.gramCodes(slicedDocs(s, dir, whereSql, textSql))
    val sig = g.groupBy("doc_id").agg(
      min(expr(permHash(1, "code"))).as("m1"),
      (2 to nPerm).map(j => min(expr(permHash(j, "code"))).as(s"m$j")): _*)
      // referenced by all four band selects
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE scan of the cached signature table, exploded to 4 band rows
    // per doc. The previous union-of-4-selects shape re-scanned the
    // sig cache per branch and paid a 4-way union stage — measured
    // 0.9 s slower at sf0.1 (2.2 s vs 1.3 s) with identical output
    // and identical shuffle volume.
    sig.select(col("doc_id") +: (1 to nPerm).map(j => col(s"m$j")) :+
        explode(array((0 until nBands).map(b => struct(lit(b).as("band"),
          col(s"m${bandRows * b + 1}").as("h1"), col(s"m${bandRows * b + 2}").as("h2"),
          col(s"m${bandRows * b + 3}").as("h3"), col(s"m${bandRows * b + 4}").as("h4"))): _*))
          .as("bb"): _*)
      .select(col("doc_id") +: (1 to nPerm).map(j => col(s"m$j")) :+
        col("bb.band").as("band") :+ col("bb.h1").as("h1") :+ col("bb.h2").as("h2") :+
        col("bb.h3").as("h3") :+ col("bb.h4").as("h4"): _*)
  }

  /** d3's CTE chain and final select, kept separate so d7 can reuse
    * the pair generation inside its own (recursive) WITH. */
  /** Oracle CTEs mirror the engine's INLINE-verify shape: the full
    * signature rides through the band join and agreement filters
    * BEFORE the DISTINCT, so the distinct deduplicates verified pairs
    * (~0.2% of band collisions) instead of the raw candidate volume.
    * Provably identical to candidates-then-verify (est_jaccard is a
    * pure function of the pair: filter∘distinct ≡ distinct∘filter) —
    * and the difference is what makes the oracle SCALE-PORTABLE: at
    * sf10p the band join emits ~1.6e9 collision rows, and a DISTINCT
    * over them out-spilled a 77 GB disk, while the verified-pair
    * distinct is ~3e6 rows. */
  private val d3Agree = (1 to nPerm)
    .map(j => s"CASE WHEN a.m$j = b.m$j THEN 1 ELSE 0 END")
    .mkString("(", " + ", s") / ${nPerm}.0")

  /** The g/sig/bands CTE prefix — d3's sketch in SQL, shared with the
    * d11 oracle (which joins the bands bipartitely instead of
    * self-joining them). */
  private def d3BandsCtes(whereSql: String, textSql: String = "text"): String = {
    val mins = (1 to nPerm).map(j => s"MIN(${permHash(j, "code")}) AS m$j").mkString(", ")
    val sigCols = (1 to nPerm).map(j => s"m$j").mkString(", ")
    val bandSelects = (0 until nBands).map { b =>
      s"SELECT doc_id, $sigCols, $b AS band, m${bandRows * b + 1} AS h1, m${bandRows * b + 2} AS h2, " +
        s"m${bandRows * b + 3} AS h3, m${bandRows * b + 4} AS h4 FROM sig"
    }.mkString(" UNION ALL ")
    s"""g AS (${TextAnalysis.gramSqlFor(whereSql, textSql)}),
    sig AS MATERIALIZED (SELECT doc_id, $mins FROM g GROUP BY doc_id),
    bands AS MATERIALIZED ($bandSelects)"""
  }

  private[graft] def d3CtesFor(theta: String, whereSql: String,
      textSql: String = "text"): String =
    s"""${d3BandsCtes(whereSql, textSql)},
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        $d3Agree AS est_jaccard
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.h1 = b.h1 AND a.h2 = b.h2
        AND a.h3 = b.h3 AND a.h4 = b.h4 AND a.doc_id < b.doc_id
      WHERE $d3Agree >= $theta)"""
  private val d3Ctes = d3CtesFor("0.75", "")

  private val d3Final = s"""
    SELECT doc_a, doc_b, est_jaccard
    FROM cand"""

  private val d3Sql = s"WITH $d3Ctes $d3Final"
  private[graft] def d3SqlFor(theta: String, whereSql: String,
      textSql: String = "text"): String =
    s"WITH ${d3CtesFor(theta, whereSql, textSql)} $d3Final"

  // --------------------------------------------- d11 fuzzy decontamination

  /** Fuzzy eval-set decontamination — the benchmark-contamination
    * sweep every training pipeline runs before a model sees the data
    * (GPT-3 App. C / Gopher-style n-gram overlap, here as MinHash
    * near-duplicate matching): find every TRAINING document that is a
    * near-duplicate of any EVAL document, so it can be dropped before
    * training. Where c8 removes exact text matches and c12 bloom-
    * filters exact 8-gram hits, d11 catches the paraphrased/perturbed
    * copies those miss, at the same sketch fidelity as d3 (same
    * grams, permutations, and band layout — one shared
    * implementation).
    *
    * The gate query defines eval = pmod(doc_id, 10) = 0 (a held-out
    * tenth); a real deployment points the eval side at its benchmark
    * corpus. Output: (train_doc, eval_doc, est_jaccard) per
    * contaminated pair, signature agreement ≥ 0.75.
    *
    * Plan, 100 TB-first: the EVAL side is broadcast — eval sets are
    * benchmark-sized (thousands to millions of rows) while train is
    * the 100 TB side, so the band join is map-side with NO shuffle of
    * the training bands at all, and a hot band bucket cannot straggle
    * (each train band row meets only the broadcast eval rows). This
    * bipartite shape is why decontamination scales where a full d3
    * self-join of train+eval would not. */
  def d11_decontaminate(s: SparkSession, dir: String): DataFrame =
    fuzzyDecontaminate(s, dir, "0.75", 10)

  /** Parametric fuzzy decontamination ([[d11_decontaminate]] = the
    * gate defaults): agreement threshold and the eval-residue modulus
    * (eval = pmod(doc_id, evalMod) = 0). Fuzz entry point. */
  private[graft] def fuzzyDecontaminate(s: SparkSession, dir: String,
      theta: String, evalMod: Int): DataFrame = {
    val bands = minhashBands(s, dir, "")
    val evalSide = expr(s"((doc_id % $evalMod) + $evalMod) % $evalMod = 0")
    bands.filter(!evalSide).as("a")
      .join(broadcast(bands.filter(evalSide)).as("b"),
        col("a.band") === col("b.band") &&
          col("a.h1") === col("b.h1") && col("a.h2") === col("b.h2") &&
          col("a.h3") === col("b.h3") && col("a.h4") === col("b.h4"))
      .select(col("a.doc_id").as("train_doc"), col("b.doc_id").as("eval_doc"),
        minhashAgree.as("est_jaccard"))
      .filter(col("est_jaccard") >= expr(theta))
      .distinct()
  }

  private[graft] def d11SqlFor(theta: String, evalMod: Int): String = s"""
    WITH ${d3BandsCtes("")}
    SELECT DISTINCT a.doc_id AS train_doc, b.doc_id AS eval_doc,
      $d3Agree AS est_jaccard
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.h1 = b.h1 AND a.h2 = b.h2
      AND a.h3 = b.h3 AND a.h4 = b.h4
    WHERE ((a.doc_id % $evalMod) + $evalMod) % $evalMod <> 0
      AND ((b.doc_id % $evalMod) + $evalMod) % $evalMod = 0
      AND $d3Agree >= $theta"""
  private val d11Sql = d11SqlFor("0.75", 10)

  // ------------------------------------------------------------ d4 SimHash

  private val simBits = 30

  /** 30-bit SimHash over the document's distinct gram codes; dup pairs
    * at Hamming distance ≤ 3.
    *
    * Candidate generation is *banded* (pigeonhole): split the sketch
    * into 4 bands — any pair within Hamming 3 must agree exactly on at
    * least one band — so candidates come from 4 equality joins on
    * narrow int keys instead of an O(N²) cross join; the exact XOR
    * popcount then verifies. Same output, shuffle-join scaling. (The
    * DuckDB oracle keeps the cross-join formulation: identical rows.)
    *
    * The band keys are only 7–8 bits wide, so there are at most 1,024
    * distinct join keys — on a large cluster that ceilings the join's
    * parallelism at 1,024 slots regardless of N, and every bucket is
    * "hot" at ~N/256 docs per band value. [[bucketPairs]] lifts both:
    * buckets wider than [[d4ChunkSize]] tile into bounded tasks keyed
    * by (bucket, ca, cb). Gate-scale corpora (≤ sf1p: widest d4
    * bucket ~3k) stay on the plain memoized path. */
  def d4_dedup_simhash(s: SparkSession, dir: String): DataFrame =
    simhashPairs(s, dir, 3, "")

  /** Parametric SimHash pairs ([[d4_dedup_simhash]] = the gate
    * defaults). `maxHamming` MUST stay ≤ 3: the banded candidate
    * route (engine AND oracle) is only exhaustive while the cut is
    * below the band count (pigeonhole over 4 disjoint bands) — the
    * fuzz draws from {1,2,3}, and anything larger is refused loudly
    * rather than silently under-producing. */
  private[graft] def simhashPairs(s: SparkSession, dir: String,
      maxHamming: Int, whereSql: String, textSql: String = "text"): DataFrame = {
    require(maxHamming <= 3, s"banded candidates are only exhaustive for hamming <= 3, got $maxHamming")
    val g = TextAnalysis.gramCodes(slicedDocs(s, dir, whereSql, textSql))
      .select(col("doc_id"), expr(mix("code")).as("h"))
    // One bit-count-vector aggregate + COUNT(*) replaces the former 30
    // independent sum(CASE WHEN bit THEN 1 ELSE -1 END) aggregates (30
    // shift/mask/branch evals per gram row into 30 buffer slots): with
    // cnt_k = per-bit set counts and n = row count, the ±1 sum is
    // s_k = 2·cnt_k − n, so the oracle's sign test s_k > 0 is exactly
    // 2·cnt_k > n (a null h contributes −1 to s_k under CASE's
    // null-is-false, and 0/+1 to cnt/n — identical; h is never null).
    val bitSums = g.groupBy("doc_id").agg(
      graft.functions.BitSetCounts(col("h"), simBits).as("cnt"),
      count(lit(1)).as("n"))
    val sketch = bitSums.select(col("doc_id"),
      (0 until simBits).map(k =>
        when(col("cnt").getItem(k) * lit(2L) > col("n"), lit(1L << k))
          .otherwise(lit(0L))).reduce(_ + _).as("simhash"))
      // referenced in all four band selects
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bandDefs = Seq((0, 8), (8, 8), (16, 7), (23, 7))
    // one scan of the cached sketch, exploded to a row per band (the
    // union-of-selects shape re-scanned the cache per band — see d3)
    val banded = sketch.select(col("doc_id"), col("simhash"),
        explode(array(bandDefs.zipWithIndex.map { case ((off, len), b) =>
          struct(lit(b).as("band"),
            expr(s"shiftright(simhash, $off) & ${(1 << len) - 1}").as("bh"))
        }: _*)).as("bb"))
      .select(col("doc_id"), col("simhash"),
        col("bb.band").as("band"), col("bb.bh").as("bh"))
    bucketPairs(banded, Seq("band", "bh"), "doc_id", d4ChunkSize,
        s"d4:$dir:$whereSql:$textSql:${corpusStamp(s, dir, "documents")}")
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.simhash ^ b.simhash)").cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** d4's tiling chunk: larger than d3's because d4's per-pair verify
    * is one XOR+popcount (vs 16 compares) and its buckets are uniform
    * (≤1,024 key values) — 4096² ≈ 16M popcounts ≈ tens of ms per
    * tile. Gate scales (widest d4 bucket ~3k at sf1p) stay plain. */
  private[graft] val d4ChunkSize = 4096

  /** The oracle mirrors the engine's BANDED candidate generation
    * instead of the plain cross join — provably identical output
    * (pigeonhole: 4 disjoint bands cover all 30 bits, so Hamming ≤ 3
    * pairs agree exactly on ≥ 1 band; the popcount verify then makes
    * the band route produce precisely the cross join's result set,
    * deduplicated by DISTINCT). The difference is scale-portability,
    * the same lineage as the d3 oracle rewrite: the cross join is
    * N²/2 popcounts — 1.25e11 at 100× gate scale, days in DuckDB —
    * while the band join is N²/(2·#buckets) ≈ 6e9. Verified
    * hash-identical to the cross-join form at sf0.01 and sf0.1. */
  private[graft] def d4SqlFor(maxHamming: Int, whereSql: String,
      textSql: String = "text"): String = {
    require(maxHamming <= 3, s"banded candidates are only exhaustive for hamming <= 3, got $maxHamming")
    val sums = (0 until simBits).map(k =>
      s"SUM(CASE WHEN (h >> $k) & 1 = 1 THEN 1 ELSE -1 END) AS s$k").mkString(", ")
    val bits = (0 until simBits).map(k =>
      s"CASE WHEN s$k > 0 THEN ${1L << k} ELSE 0 END").mkString(" + ")
    val bandDefs = Seq((0, 8), (8, 8), (16, 7), (23, 7))
    val bandSelects = bandDefs.zipWithIndex.map { case ((off, len), b) =>
      s"SELECT doc_id, simhash, $b AS band, (simhash >> $off) & ${(1 << len) - 1} AS bh FROM sk"
    }.mkString(" UNION ALL ")
    s"""
    WITH g AS (${TextAnalysis.gramSqlFor(whereSql, textSql)}),
    hh AS (SELECT doc_id, ${mix("code")} AS h FROM g),
    bs AS (SELECT doc_id, $sums FROM hh GROUP BY doc_id),
    sk AS MATERIALIZED (SELECT doc_id, $bits AS simhash FROM bs),
    bands AS MATERIALIZED ($bandSelects)
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
      CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= $maxHamming"""
  }
  private val d4Sql = d4SqlFor(3, "")

  // ------------------------------------------------------ d5 embedding

  /** Embedding-cosine near-dup pairs (threshold 0.4), as a BLOCK-TILED
    * exact all-pairs join: vectors are hashed into `d5Blocks` blocks,
    * each unordered block pair (lo ≤ hi) becomes one shuffle group, and
    * the group's task computes its tile of the cosine matrix locally.
    *
    * Why tiling and not LSH candidates: at threshold 0.4 the qualifying
    * pairs sit in the ~3σ tail of the random-cosine distribution
    * (median hit ≈ 0.43 on the test corpora — these are not tight
    * duplicates), and no hyperplane-LSH parameterization reaches
    * recall 1.0 there without candidate sets as large as the full
    * cross product; the exact low-threshold join is intrinsically
    * quadratic in COMPUTE. What scale-out must fix is the previous
    * plan's BroadcastNestedLoopJoin — the whole table broadcast to
    * every task — and tiling does: one hash shuffle (each vector
    * replicated `d5Blocks`×), per-task memory bounded by two blocks
    * (pick blocks ∝ √(n/targetBlockRows) on a cluster), no broadcast,
    * no driver involvement. For duplicate-shaped thresholds (≥0.8)
    * where LSH pruning IS sound, [[embeddingPairs]] dispatches to
    * [[lshPairs]] — banded candidates from s2's hyperplanes, exact
    * verify, equality-join shape. Arithmetic matches [[VectorOps]]'s
    * sequential-double-fold contract bit-for-bit ([[cosineOf]]), so
    * the exact DuckDB oracle still hash-matches. */
  def d5_dedup_embedding(s: SparkSession, dir: String): DataFrame =
    embeddingPairs(emb(s, dir), 0.4)

  /** Near-dup threshold boundary: at θ ≥ 0.8 the qualifying pairs are
    * duplicate-shaped (tiny angles), where banded hyperplane-LSH
    * candidate generation is sound and turns the O(n²) tile sweep into
    * equality joins on narrow int band keys — the 100-TB shape. Below
    * it, LSH pruning loses recall and the exact tiled join stands. */
  private[graft] val d5LshThreshold = 0.8

  /** Embedding-cosine near-dup pairs at `threshold`, dispatching the
    * candidate strategy on threshold shape (see [[d5LshThreshold]]):
    * [[lshPairs]] for duplicate-shaped thresholds, [[tiledPairs]] —
    * the exact quadratic sweep — below. Input needs (vec_id,
    * embedding); output is (vec_a, vec_b, cosine), vec_a < vec_b. */
  def embeddingPairs(e: DataFrame, threshold: Double): DataFrame = {
    // null embeddings: NULL cosine never passes a >= threshold in
    // either engine, so dropping them up front is oracle-equivalent
    // (and keeps the tile loop null-free)
    val withNorm = e.filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"),
        VectorOps.norm2(col("embedding")).as("n2"))
    if (threshold >= d5LshThreshold) lshPairs(withNorm, threshold)
    else tiledPairs(withNorm, threshold)
  }

  /** Exact block-tiled all-pairs cosine join (see the d5 scaladoc). */
  private[graft] def tiledPairs(e: DataFrame, threshold: Double): DataFrame = {
    val s = e.sparkSession
    import s.implicits._
    val nb = d5Blocks
    // pmod, not %: Scala/SQL % is sign-preserving, so a negative vec_id
    // would land in a block index outside 0..nb-1 that no exploded
    // `other` ever visits — its pairs would silently vanish
    e.withColumn("blk", pmod(col("vec_id"), lit(nb)).cast("int"))
      .select(col("blk"), col("vec_id"), col("n2"), col("embedding"),
        explode(sequence(lit(0), lit(nb - 1))).as("other"))
      .select(
        least(col("blk"), col("other")).as("lo"),
        greatest(col("blk"), col("other")).as("hi"),
        col("blk"), col("vec_id"), col("n2"), col("embedding"))
      .as[(Int, Int, Int, Long, Double, Array[Float])]
      .groupByKey(t => (t._1, t._2))
      .flatMapGroups[(Long, Long, Double)] { (key: (Int, Int),
          it: Iterator[(Int, Int, Int, Long, Double, Array[Float])]) =>
        val (lo, hi) = key
        val rows = it.toArray
        val a = rows.filter(_._3 == lo)
        val b = if (lo == hi) a else rows.filter(_._3 == hi)
        for {
          x <- a.iterator
          y <- b
          // lo == hi tile: strict ordering keeps each unordered pair once
          if lo != hi || x._4 < y._4
          cos = cosineOf(x._6, y._6, x._5, y._5)
          if cos >= threshold
        } yield
          if (x._4 < y._4) (x._4, y._4, cos) else (y._4, x._4, cos)
      }
      .toDF("vec_a", "vec_b", "cosine")
  }

  /** LSH bands for [[lshPairs]]: 24 bands × 3 hyperplanes. A pair at
    * cosine θ collides in one 3-plane band with p = (1 − arccos(θ)/π)³
    * (≈ 0.56 at θ = 0.85); 24 OR'd bands take the nominal miss
    * probability to (1−p)²⁴ ≈ 3e-9 per pair. The planes are
    * DETERMINISTIC (s2's) and correlated band misses run hotter than
    * the random-plane theory (12×4 measurably dropped
    * threshold-adjacent pairs), hence the generous band count — and
    * because the planes are fixed, recall on a fixed corpus is a
    * checkable fact, not a distribution: D5LshSpec asserts LSH ≡ tiled
    * output exactly. */
  private val d5LshBands = 24
  private val d5LshRowsPerBand = 3

  /** Duplicate-threshold mode: banded hyperplane-LSH candidates
    * (equality self-join on (band, bucket) int keys — the same shape
    * as d3's MinHash banding and [[Similarity.s2_ann_lsh]]'s buckets,
    * whose deterministic planes this reuses) + exact-cosine verify
    * with the same [[cosineOf]]/[[VectorOps]] arithmetic contract as
    * the tiled path, so qualifying pairs carry bit-identical cosines.
    * At 100 TB this is bucketed equality-join work sized to the
    * band-collision volume, never an O(n²) sweep. */
  private[graft] def lshPairs(e: DataFrame, threshold: Double): DataFrame = {
    def bandBucket(b: Int): Column =
      (0 until d5LshRowsPerBand).map { r =>
        val p = b * d5LshRowsPerBand + r
        when(Similarity.hyperplaneDot(p) >= 0, lit(1L << r)).otherwise(lit(0L))
      }.reduce(_ + _)
    val banded = e.select(col("vec_id"),
      explode(array((0 until d5LshBands).map(b =>
        struct(lit(b).as("band"), bandBucket(b).as("bkt"))): _*)).as("bb"))
      .select(col("vec_id"), col("bb.band").as("band"), col("bb.bkt").as("bkt"))
    // 24 bands × 3-bit buckets = ≤192 distinct join keys — the same
    // cluster-parallelism ceiling as d4's band space; tile wide
    // buckets (memo key: the input plan's semantic hash — lshPairs
    // takes arbitrary frames, not a corpus dir)
    val cand = bucketPairs(banded, Seq("band", "bkt"), "vec_id",
        d4ChunkSize, s"d5lsh:${e.semanticHash()}")
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    cand
      .join(e.select(col("vec_id").as("vec_a"),
        col("embedding").as("ea"), col("n2").as("na")), "vec_a")
      .join(e.select(col("vec_id").as("vec_b"),
        col("embedding").as("eb"), col("n2").as("nb")), "vec_b")
      .select(col("vec_a"), col("vec_b"),
        VectorOps.cosineFrom(
          VectorOps.dot(col("ea"), col("eb")), col("na"), col("nb")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Block-grid width for [[d5_dedup_embedding]]: 16 → 136 tile tasks,
    * plenty for local[32]; on a cluster scale with √n. */
  private val d5Blocks = 16

  /** [[VectorOps.dot]]/[[VectorOps.cosineFrom]] arithmetic (sequential
    * left fold in double over array order, then d/√(n2a·n2b)) for the
    * tiled inner loop — VectorOpsSpec pins the Catalyst expression to
    * this same contract, and IEEE multiply commutes, so tile order
    * cannot change a bit. */
  private[graft] def cosineOf(x: Array[Float], y: Array[Float],
      n2x: Double, n2y: Double): Double = {
    var d = 0.0
    var i = 0
    while (i < x.length) { d += x(i).toDouble * y(i).toDouble; i += 1 }
    d / math.sqrt(n2x * n2y)
  }

  // list_dot_product, not correlated UNNEST subqueries: bit-identical
  // sequential double folds, but DuckDB plans the correlated form with
  // >40-min constants at 10x gate scale (SCALE.md round 7) — this
  // keeps the committed oracle scale-portable with zero substitution.
  /** Probe side sliced into 16 residue classes (UNION ALL) so DuckDB
    * can parallelize the quadratic sweep — the embeddings table is
    * 1–2 of DuckDB's ~122k-row morsels at every gate scale, so the
    * unsliced inequality join ran on 1–2 threads (~3 h at sf10p).
    * Output-identical: the slices partition `a.vec_id` into pmod
    * residue classes — DuckDB's % is sign-preserving, so a plain
    * `% k = i` would silently drop negative ids from every branch
    * (the engine's tiledPairs guards the same case with pmod). Same
    * fix as the c5 oracle. */
  private val d5Sql = {
    val k = 16
    val branches = (0 until k).map { i =>
      s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
        / SQRT(a.n2 * b.n2) AS cosine
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE ((a.vec_id % $k) + $k) % $k = $i
      AND list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
        / SQRT(a.n2 * b.n2) >= 0.4"""
    }.mkString("\n    UNION ALL\n    ")
    s"""
    WITH e AS MATERIALIZED (
      SELECT vec_id, embedding,
        list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) AS n2
      FROM embeddings)
    $branches"""
  }

  // ------------------------------------------------------------ wiring

  // --------------------------------------------------- d7 dup clusters

  /** Near-dup CLUSTERS from the MinHash pair graph: connected
    * components labelled by component-min doc_id — a session spans
    * A~B, B~C even when A and C never pair directly, so keeper
    * selection must be per component, not per pairwise edge.
    *
    * Two physical strategies, dispatched by the SAME sizing rule that
    * partitions the loop (one partition per ~250k edges — the dup
    * graph is orders of magnitude smaller than the corpus the pair
    * generation scanned):
    *
    *   - graph fits ONE partition (loopParts == 1, i.e. < 250k
    *     pairs): a single-task union-find over the edge partition —
    *     one mapPartitions job, no iteration. This is the logical
    *     endpoint of "size the shuffles to the label table": when the
    *     sizing already routes every round through one task, eight
    *     round-trips of driver scheduling buy nothing a single pass
    *     can't do (measured: ~2.1 s of loop wall → ~0.2 s at sf0.1).
    *   - larger graphs: iterative min-label propagation — per round,
    *     one hop (labels flow along edges, min over self ∪ neighbors
    *     via union + partial agg, no outer join) then one pointer
    *     jump THROUGH THE HOPPED TABLE (label(label(x)) on the new
    *     labels — jumping through the stale table converged in 8
    *     rounds where this takes 6 on the sf0.1 graph). Convergence
    *     is detected from the label-sum (labels only ever decrease,
    *     so an unchanged sum ⇔ a fixpoint), piggybacked on the action
    *     that materializes the round's checkpoint.
    *
    * Both strategies produce the identical fixpoint (component-min
    * labels); PipelineSpec asserts it on a forced-distributed run.
    * The DuckDB oracle computes the same components via unrolled
    * hop+jump rounds. */
  /** Rounds the last [[d7_dedup_clusters]] run took (diagnostics /
    * tests: pointer jumping must keep this ~log(diameter)). */
  @volatile var d7Rounds: Int = 0

  def d7_dedup_clusters(s: SparkSession, dir: String): DataFrame = {
    // Materialize the pair table ONCE (its plan is the whole minhash
    // pipeline); its row count sizes the loop's shuffles — the edge
    // table is exactly 2× pairs, and labels ≤ edges.
    val pairs = d3_dedup_minhash(s, dir).select("doc_a", "doc_b")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nPairs = pairs.count()
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    val prevAqe = s.conf.get("spark.sql.adaptive.enabled")
    // The label/edge tables are sized by the dup GRAPH — orders of
    // magnitude smaller than the corpus the pair generation scanned.
    // Size the loop's shuffles to them (one partition per ~250k
    // edges), exactly like streaming state partitioning: at gate
    // scale that is a single partition per stage; at 100 TB it grows
    // with the dup-graph size.
    val loopParts = math.max(1L,
      math.min(prevShuffle.toLong, 2 * nPairs / 500000 + 1)).toInt
    // Both edge directions from ONE pass over the cached pair table
    // (explode emits (a,b) and (b,a) per pair in a single scan), then
    // HASH-PARTITIONED BY dst before the persist: every round's
    // edges⋈labels join requires exactly that distribution, so the
    // cached partitioning satisfies EnsureRequirements and the loop
    // never re-shuffles the edge table — only the (smaller) label
    // table moves per round.
    val edges = pairs.select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .repartition(loopParts, col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // The single-task path's labels are LAZY over the edge cache —
    // eagerly checkpoint them (one tiny job) BEFORE releasing the
    // edge/pair caches, or the caller's action would re-run the whole
    // pair pipeline. (The distributed path's labels are already a
    // checkpoint from its last round.)
    val labels =
      if (loopParts == 1) componentsSingleTask(edges).localCheckpoint(true)
      else propagateComponents(s, edges, loopParts, prevShuffle, prevAqe)
    edges.unpersist()
    pairs.unpersist()
    val sizes = labels.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "cluster_id").select("doc_id", "cluster_id", "cluster_size")
  }

  /** Single-task connected components: union-find with union-by-min
    * (the smaller root adopts the larger, so every tree's root IS the
    * component minimum) and path compression, over the one edge
    * partition. One mapPartitions job — no iteration, no per-round
    * scheduling. Only dispatched when the loop sizing already routes
    * every round through a single partition (< ~250k pairs). */
  private[graft] def componentsSingleTask(edges: DataFrame): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    d7Rounds = 1
    edges.select(col("src").cast("long"), col("dst").cast("long"))
      .as[(Long, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x
          while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        it.foreach { case (a, b) =>
          parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
          val ra = find(a); val rb = find(b)
          if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
        }
        parent.keysIterator.map(k => (k, find(k))).toArray.iterator
      }
      .toDF("doc_id", "cluster_id")
  }

  /** Distributed min-label propagation with pointer jumping (see the
    * d7 scaladoc for the per-round shape and convergence rule). */
  private[graft] def propagateComponents(s: SparkSession, edges: DataFrame,
      loopParts: Int, prevShuffle: String, prevAqe: String): DataFrame = {
    s.conf.set("spark.sql.shuffle.partitions", loopParts.toString)
    // the loop's plans are static and its tables tiny relative to the
    // corpus — AQE re-planning per round only adds latency here
    s.conf.set("spark.sql.adaptive.enabled", "false")
    // Iterative algorithms MUST truncate lineage each round
    // (localCheckpoint): a persisted plan still nests the previous
    // iteration's logical plan, and the growing tree OOMs the DRIVER
    // after enough rounds regardless of data size.
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .select(col("doc_id"), col("doc_id").as("cluster_id"))
      .localCheckpoint(true)
    var converged = false
    // Labels only ever decrease (min is monotone), so the label-sum is
    // strictly decreasing until the fixpoint: an unchanged sum ⇔ no
    // label moved. decimal(38,0) cannot overflow at any plausible
    // scale (1e12 docs × 1e18 max id = 1e30 < 1e38).
    var prevSum: java.math.BigDecimal = null
    d7Rounds = 0
    try {
      while (!converged) {
        d7Rounds += 1
        // hop: min over self ∪ neighbors — union + partial agg, no
        // outer join (labels flow one hop along edges; edges' cached
        // dst-partitioning means only `labels` shuffles here)
        val hop = edges.join(labels, edges("dst") === labels("doc_id"))
          .select(col("src").as("doc_id"), col("cluster_id"))
        val mid = hop.unionAll(labels)
          .groupBy(col("doc_id")).agg(min("cluster_id").as("mid"))
        // pointer jump THROUGH THE HOPPED TABLE: label(label(x)) on
        // the post-hop labels — jumping through the stale table
        // converges measurably slower (8 vs 6 rounds on the sf0.1
        // graph) for the same per-round cost
        val par = mid.select(col("doc_id").as("p_id"), col("mid").as("p_label"))
        // LAZY checkpoint: the convergence aggregate right below is
        // the round's one action — it materializes the checkpoint in
        // the same job, instead of eager-checkpoint + count running
        // the round's plan twice (measured ~35% off the loop wall).
        val updated = mid.join(par, mid("mid") === par("p_id"), "left")
          .select(col("doc_id"),
            least(col("mid"), coalesce(col("p_label"), col("mid"))).as("cluster_id"))
          .localCheckpoint(false)
        val roundSum = updated
          .agg(sum(col("cluster_id").cast("decimal(38,0)"))).first().getDecimal(0)
        // null sum ⇔ empty graph (can't regress further); compareTo,
        // not equals: BigDecimal.equals is scale-sensitive
        converged = roundSum == null ||
          (prevSum != null && prevSum.compareTo(roundSum) == 0)
        prevSum = roundSum
        labels = updated
      }
    } finally {
      s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      s.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
    labels
  }

  /** Unrolled hop + pointer-jump rounds for [[d7Sql]]. Each round the
    * min label advances ≥1 hop and the pointer jump then halves the
    * remaining pointer distance, so reach grows ~2^round: 20 rounds
    * cover any component of diameter ≲ 2^20 with label-table (linear)
    * state per round. The previous recursive-transitive-closure oracle
    * accumulated all-pairs reachability — quadratic in cluster size —
    * and exhausted >80 GB of DuckDB temp at 10× gate scale (SCALE.md
    * round 7); this formulation mirrors the engine's own propagation
    * and is scale-portable. Non-convergence inside 20 rounds would
    * surface as a loud gate hash-mismatch, never a silent wrong
    * answer. The round CTEs are `AS MATERIALIZED`: DuckDB 1.0 inlines
    * plain CTEs per reference, and each round references its
    * predecessor twice — un-materialized, the chain expands 2^rounds
    * plan copies (observed as fd exhaustion re-opening the parquet
    * leaf); materialized, the plan is linear like the engine's. */
  private val d7OracleRounds = 20

  private val d7Sql = {
    val rounds = (1 to d7OracleRounds).map { i =>
      s"""h$i AS MATERIALIZED (
      SELECT l.n, LEAST(l.lbl, MIN(x.lbl)) AS lbl
      FROM l${i - 1} l JOIN edges e ON e.s = l.n JOIN l${i - 1} x ON x.n = e.d
      GROUP BY l.n, l.lbl),
    l$i AS MATERIALIZED (
      SELECT h.n, p.lbl FROM h$i h JOIN h$i p ON p.n = h.lbl)"""
    }.mkString(",\n    ")
    s"""
    WITH $d3Ctes,
    pairs AS MATERIALIZED ($d3Final),
    edges AS MATERIALIZED (
      SELECT doc_a AS s, doc_b AS d FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs),
    l0 AS MATERIALIZED (SELECT DISTINCT s AS n, s AS lbl FROM edges),
    $rounds,
    lab AS MATERIALIZED (SELECT n AS doc_id, lbl AS cluster_id FROM l$d7OracleRounds)
    SELECT l.doc_id, l.cluster_id, c.cluster_size
    FROM lab l JOIN (
      SELECT cluster_id, COUNT(*) AS cluster_size FROM lab GROUP BY cluster_id) c
    USING (cluster_id)"""
  }

  // --------------------------------------------- d8 semantic (SemDeDup)

  /** d8's within-cluster near-dup threshold — d5's corpus-calibrated
    * 0.4, so d8's pair semantics are directly comparable to the exact
    * sweep (D8SemanticSpec measures the recall of the cluster
    * restriction against d5's exact pair set). */
  private[graft] val d8Theta = 0.4

  /** Target members per cluster: k = max(4, ceil(N / 256)). Scaling k
    * WITH the corpus is the whole point — cluster width stays ~256, so
    * the within-cluster quadratic is 256·N/2 comparisons (linear),
    * never N². */
  private[graft] val d8TargetClusterSize = 256

  /** Above this centroid count the assignment goes hierarchical
    * ([[Similarity.kmeansAssignHier]], ~2·N·√k distances per pass);
    * at or below it the flat N×k pass is already near the hierarchical
    * cost (k ≤ 64 ⇒ 2√k ≥ k/4) and exactness is free. The oracle
    * dispatches on the same k via two emptiness-gated SQL branches, so
    * gate corpora exercise flat at sf0.01/sf0.1 (k = 4/8) and
    * hierarchical at sf1p/sf10p (k = 79/782). */
  private[graft] val d8FlatMaxK = 64L

  /** Semantic deduplication, SemDeDup-shaped (Abbas et al. 2023,
    * arXiv:2303.09540): k-means-cluster the embeddings, then search
    * near-duplicates ONLY within each cluster and keep the member
    * closest to its centroid. The cluster restriction is the scale
    * story — candidate pairs are ~(clusterSize · N)/2 instead of N²/2,
    * the exact trade the paper makes (recall of the cluster filter vs
    * the exact sweep is measured, not assumed: D8SemanticSpec).
    *
    * Plan shape at 100 TB: centroids broadcast (k·d ints — ~400 KB at
    * 100× gate scale); assignment dispatches to the hierarchical
    * coarse-quantized path ([[Similarity.kmeansAssignHier]], ~2·N·√k
    * distances per pass) above [[d8FlatMaxK]] centroids — the flat
    * N×k pass with k ∝ N/256 was the suite's one super-linear compute
    * stage (measured 100× cost on 10× data, SCALE.md round 10); the
    * pair stage shuffles by
    * `cluster` and rides [[bucketPairs]], so a skewed cluster that
    * outgrows [[d3ChunkSize]] tiles into bounded tasks instead of
    * becoming one straggler — balanced clusters keep the plain
    * equality self-join.
    *
    * Drop rule (deterministic, pairwise-exists): a vector is dropped
    * iff some same-cluster vector within cosine ≥ [[d8Theta]] is
    * strictly better — smaller squared centroid distance, ties to the
    * smaller vec_id. The best member of every near-dup neighborhood
    * survives; all arithmetic is the same int64 distance /
    * double-fold cosine contract as s5/d5, so the DuckDB oracle
    * matches bit-for-bit.
    *
    * Output: every embedding row as (vec_id, cluster, dist2, dropped).
    */
  def d8_dedup_semantic(s: SparkSession, dir: String): DataFrame =
    semanticDedup(s, dir, d8TargetClusterSize, d8Theta.toString, "")

  /** Dispatch side ("flat" | "hier") taken by the most recent
    * [[semanticDedup]] call on this JVM. Fuzz instrumentation only:
    * the side depends on the sliced corpus count, which the generator
    * cannot know at draw time, so [[graft.fuzz.PipeFuzzRun]] reads
    * this after each sem_dedup seed to prove both sides of the
    * [[d8FlatMaxK]] boundary were exercised. */
  @volatile private[graft] var lastSemanticDispatch: String = ""

  /** Parametric semantic dedup ([[d8_dedup_semantic]] = the gate
    * defaults): target members per cluster (drives k = max(4,
    * ceil(N/targetClusterSize)) and with it the flat-vs-hierarchical
    * assignment dispatch at [[d8FlatMaxK]]), within-cluster cosine
    * threshold (literal string, parsed identically by both engines),
    * corpus under `whereSql`. Fuzz entry point — varying
    * targetClusterSize swings k across the dispatch boundary. */
  private[graft] def semanticDedup(s: SparkSession, dir: String,
      targetClusterSize: Int, theta: String, whereSql: String): DataFrame = {
    val e = {
      val e0 = emb(s, dir)
      if (whereSql.isEmpty) e0 else e0.where(whereSql)
    }
    val q = Similarity.quantized(e)
    // k and the flat-vs-hierarchical dispatch are ONE bounded
    // driver-side scalar (unsliced: a parquet COUNT(*) answered from
    // footer metadata; sliced: one filtered count scan) — the same
    // adaptive-dispatch discipline as d7's
    // union-find. The two paths are NOT output-identical (the
    // hierarchical cell restriction is the scale approximation, see
    // kmeansAssignHier), so the oracle mirrors the dispatch with two
    // emptiness-gated branches on the same k.
    val n = e.count()
    val k = math.max(4L, math.ceil(n / targetClusterSize.toDouble).toLong)
    lastSemanticDispatch = if (k <= d8FlatMaxK) "flat" else "hier"
    val c0 = q.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("qv").as("cv"))
    // The assignment is referenced by both self-join sides of the pair
    // stage AND the final left join — unpersisted, each reference
    // re-runs the whole k-means lineage (two assignment passes + the
    // centroid recompute). The persisted frame is N×3 longs, bounded
    // and tiny next to the corpus it describes.
    val a2 = (if (k <= d8FlatMaxK) Similarity.kmeansAssign(q, c0)
              else Similarity.kmeansAssignHier(q, c0,
                math.max(1L, math.floor(math.sqrt(k.toDouble)).toLong)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val e2 = e.filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"),
        VectorOps.norm2(col("embedding")).as("n2"))
    val j = a2.join(e2, Seq("vec_id"))
      .select(col("cluster"), col("vec_id"), col("dist2"),
        col("embedding"), col("n2"))
    val losers = bucketPairs(j, Seq("cluster"), "vec_id", d3ChunkSize,
        s"d8:$dir:$targetClusterSize:$theta:$whereSql:${corpusStamp(s, dir, "embeddings")}")
      .filter(VectorOps.cosineFrom(
        VectorOps.dot(col("a.embedding"), col("b.embedding")),
        col("a.n2"), col("b.n2")) >= theta.toDouble)
      .select(when(col("a.dist2") > col("b.dist2") ||
          (col("a.dist2") === col("b.dist2") &&
            col("a.vec_id") > col("b.vec_id")),
        col("a.vec_id")).otherwise(col("b.vec_id")).as("vec_id"))
      .distinct()
    a2.join(losers.withColumn("__l", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"), col("dist2"),
        coalesce(col("__l"), lit(false)).as("dropped"))
  }

  /** The oracle mirrors the engine's k-dispatch with TWO branches in
    * one scale-portable query: a flat s5-shaped chain (c0…fa2, seeded
    * only when k ≤ [[d8FlatMaxK]]) and a hierarchical chain
    * (hc0…h2a, seeded only when k > it) UNION ALL'd — the dead
    * branch's centroid seed is empty and emptiness propagates through
    * its joins, so each scale pays only its own branch. k and g are
    * scalar subqueries over COUNT(*), so the SQL runs verbatim at
    * every SF. Then the within-cluster pair stage. Distances use the algebraic
    * expansion q·q − 2·q·c + c·c over `list_dot_product` — exact (all
    * terms < 2^53) and it avoids DuckDB's correlated-UNNEST planning
    * cliff at big SF (see the d5 oracle note). The centroid-mean CTE
    * filters `qv IS NOT NULL`: DuckDB pads a zipped UNNEST(range) ×
    * UNNEST(NULL qv) to 64 NULL-v rows that would inflate the mean's
    * COUNT(*) divisor, while the engine's posexplode of a NULL array
    * emits zero rows (same fix in s5's oracle). */
  private[graft] def d8SqlFor(targetClusterSize: Int, theta: String,
      whereSql: String): String = {
    val where = if (whereSql.isEmpty) "" else s" WHERE $whereSql"
    val andWhere = if (whereSql.isEmpty) "" else s" AND ($whereSql)"
    val qs = s"${1L << Similarity.qScaleBits}.0"
    def ldist(a: String, b: String) =
      s"""CAST(list_dot_product(CAST($a AS DOUBLE[]), CAST($a AS DOUBLE[]))
       - 2 * list_dot_product(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[]))
       + list_dot_product(CAST($b AS DOUBLE[]), CAST($b AS DOUBLE[])) AS BIGINT)"""
    // Lloyd update over assignment CTE `a` (means CTE $m, centroid CTE
    // $c) — shared verbatim by the flat and hierarchical branches.
    def meansCtes(m: String, c: String, a: String) = s"""
    $m AS (
      SELECT $a.cid, e.dim,
        CAST(FLOOR(CAST(SUM(e.v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cvd
      FROM (SELECT vec_id, UNNEST(range(1, ${Similarity.dim + 1})) AS dim,
              UNNEST(qv) AS v FROM q WHERE qv IS NOT NULL) e
      JOIN $a ON $a.vec_id = e.vec_id
      GROUP BY $a.cid, e.dim),
    $c AS (SELECT cid, LIST(cvd ORDER BY dim) AS cv FROM $m GROUP BY cid)"""
    // One hierarchical assignment pass over centroid CTE $cents
    // (mirrors kmeansAssignHier.assignH): seeds = g smallest cids,
    // cell map = centroid→nearest seed, vector→nearest seed, exact
    // argmin within the cell. Emits ${p}a (vec_id, cid, dist); all
    // ties break (dist, id) ascending like the engine's min(struct).
    def hierPass(p: String, cents: String) = s"""
    ${p}s AS (
      SELECT cid AS gid, cv AS gv FROM (
        SELECT cid, cv, ROW_NUMBER() OVER (ORDER BY cid) AS r FROM $cents) z, gg
      WHERE z.r <= gg.g),
    ${p}m AS (
      SELECT cid, gid FROM (
        SELECT cid, gid, ROW_NUMBER() OVER (PARTITION BY cid ORDER BY gd, gid) AS rk
        FROM (SELECT c.cid, s.gid, ${ldist("c.cv", "s.gv")} AS gd
              FROM $cents c CROSS JOIN ${p}s s) y) z WHERE rk = 1),
    ${p}v AS (
      SELECT vec_id, gid FROM (
        SELECT vec_id, gid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY gd, gid) AS rk
        FROM (SELECT q.vec_id, s.gid, ${ldist("q.qv", "s.gv")} AS gd
              FROM q CROSS JOIN ${p}s s) y) z WHERE rk = 1),
    ${p}a AS (
      SELECT vec_id, cid, dist FROM (
        SELECT vec_id, cid, dist,
          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
        FROM (SELECT q.vec_id, c.cid, ${ldist("q.qv", "c.cv")} AS dist
              FROM q JOIN ${p}v v ON v.vec_id = q.vec_id
              JOIN ${p}m m ON m.gid = v.gid JOIN $cents c ON c.cid = m.cid) y) z
      WHERE rk = 1)"""
    // The flat branch's c0 is gated on k <= d8FlatMaxK and the
    // hierarchical branch's hc0 on k > it: whichever gate is false
    // yields an EMPTY centroid seed, and emptiness propagates through
    // every downstream CTE of that branch (cross/inner joins against
    // an empty side), so the dead branch costs ~nothing even at sf10p
    // — the dispatch is data-driven inside one scale-portable query.
    s"""
    WITH q AS (
      SELECT vec_id,
        LIST_TRANSFORM(embedding,
          x -> CAST(ROUND(CAST(x AS DOUBLE) * $qs) AS BIGINT)) AS qv
      FROM embeddings$where),
    kk AS (SELECT GREATEST(4, CAST(CEIL(COUNT(*) / ${targetClusterSize}.0) AS BIGINT)) AS k
           FROM embeddings$where),
    gg AS (SELECT GREATEST(1, CAST(FLOOR(SQRT(k)) AS BIGINT)) AS g FROM kk),
    c0 AS (SELECT vec_id AS cid, qv AS cv FROM q, kk
           WHERE kk.k <= $d8FlatMaxK AND vec_id < kk.k),
    d1 AS (
      SELECT q.vec_id, c.cid, ${ldist("q.qv", "c.cv")} AS dist
      FROM q CROSS JOIN c0 c),
    a1 AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
        FROM d1) x WHERE rk = 1),
    ${meansCtes("m1", "c1", "a1")},
    d2 AS (
      SELECT q.vec_id, c.cid, ${ldist("q.qv", "c.cv")} AS dist
      FROM q CROSS JOIN c1 c),
    fa2 AS (
      SELECT vec_id, CAST(cid AS BIGINT) AS cluster, CAST(dist AS BIGINT) AS dist2 FROM (
        SELECT vec_id, cid, dist,
          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
        FROM d2) x WHERE rk = 1),
    hc0 AS (SELECT vec_id AS cid, qv AS cv FROM q, kk
            WHERE kk.k > $d8FlatMaxK AND vec_id < kk.k),
    ${hierPass("h1", "hc0")},
    ${meansCtes("hm1", "hc1", "h1a")},
    ${hierPass("h2", "hc1")},
    a2 AS (
      SELECT vec_id, cluster, dist2 FROM fa2
      UNION ALL
      SELECT vec_id, CAST(cid AS BIGINT) AS cluster, CAST(dist AS BIGINT) AS dist2
      FROM h2a),
    e2 AS (
      SELECT vec_id, embedding,
        list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) AS n2
      FROM embeddings WHERE embedding IS NOT NULL$andWhere),
    j AS (
      SELECT a.vec_id, a.cluster, a.dist2, e.embedding, e.n2
      FROM a2 a JOIN e2 e USING (vec_id)),
    p AS (
      SELECT x.vec_id AS va, y.vec_id AS vb, x.dist2 AS da, y.dist2 AS db
      FROM j x JOIN j y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
      WHERE list_dot_product(CAST(x.embedding AS DOUBLE[]), CAST(y.embedding AS DOUBLE[]))
          / SQRT(x.n2 * y.n2) >= $theta),
    losers AS (
      SELECT DISTINCT CASE WHEN da > db OR (da = db AND va > vb) THEN va ELSE vb END AS vec_id
      FROM p)
    SELECT a.vec_id, a.cluster, a.dist2, (l.vec_id IS NOT NULL) AS dropped
    FROM a2 a LEFT JOIN losers l USING (vec_id)"""
  }
  private val d8Sql = d8SqlFor(d8TargetClusterSize, d8Theta.toString, "")

  // ------------------------------------------------------------ d9 spans

  /** Window width (tokens) for [[d9_dedup_spans]]. 8 tokens ≈ the
    * shortest phrase worth calling a duplicated span on this corpus:
    * at 5 the common-phrase noise floor kicks in (spans stop being
    * 1-per-doc), at 12 nothing changes vs 8 — measured on the gate
    * corpora before pinning. */
  val d9WindowTokens = 8

  /** Exact repeated-SPAN detection — the distributed equivalent of
    * suffix-array substring dedup ("Deduplicating Training Data Makes
    * Language Models Better", Lee et al. 2022): where d1 dedups whole
    * documents and d2/d3/d4 score whole-document similarity, d9 finds
    * the exact sub-document passages that recur across documents
    * (boilerplate, licenses, quoted text) and reports each as a
    * maximal token span.
    *
    * Plan, 100 TB-first:
    *   1. hash each document's overlapping [[d9WindowTokens]]-token
    *      windows in one codegen'd byte pass ([[graft.functions.WindowHashes]]
    *      — rows ∝ corpus token count, linear, no window strings built);
    *   2. CANDIDATE pass: group by the window hash — the shuffle
    *      carries an 8-byte key + doc_id, never the window text — and
    *      keep hashes seen in ≥ 2 distinct docs;
    *   3. CONFIRM pass: semi-join the hashed positions to the candidate
    *      hashes (AQE broadcasts the hash set when small), rebuild the
    *      window STRING for the surviving few only (doc_id join-back),
    *      and re-group by the exact string — so a 64-bit hash
    *      collision can never fabricate a duplicate, yet full window
    *      text is only ever built for the candidate subset;
    *   4. merge adjacent duplicated positions per doc into maximal
    *      spans (gaps-and-islands: `pos − row_number()` over the
    *      per-doc position order — the window partition is per-doc,
    *      so no skew at scale).
    *
    * Two scans of `documents` (steps 2 and 3 each consume the window
    * explode once) beat caching the explode: at 100 TB the exploded
    * frame is ~W× the corpus and the explode is all codegen. What IS
    * persisted is the candidate subset (bounded by the corpus's
    * duplicated-content volume), consumed by both the confirm group
    * and the position join. Output: one row per maximal duplicated
    * span — (doc_id, span_start, span_end, span_toks), token
    * positions 1-based inclusive. */
  def d9_dedup_spans(s: SparkSession, dir: String): DataFrame =
    spanDetect(s, dir, d9WindowTokens, 2, "")

  /** Parametric span detection ([[d9_dedup_spans]] = the gate defaults).
    * `whereSql` is a SQL predicate applied to `documents` BEFORE
    * windowing — the same text works in both engines, which is what
    * lets [[graft.fuzz.PipeFuzz]] drive seeded corpus slices
    * differentially. */
  private[graft] def spanDetect(s: SparkSession, dir: String, w: Int,
      minDocs: Int, whereSql: String, textSql: String = "text"): DataFrame = {
    val (_, spans) = spanFrames(s, dir, w, minDocs, whereSql, textSql)
    spans.select(col("doc_id"), col("span_start"),
      (col("last_w") + (w - 1)).as("span_end"),
      (col("last_w") - col("span_start") + w).as("span_toks"))
  }

  /** Shared d9/d10 machinery: (dupWin, spans).
    *
    * `dupWin` is one row per duplicated window STRING with its keeper
    * (the minimum doc_id containing that exact string); `spans` is one
    * row per maximal duplicated span — (doc_id, span_start, last_w)
    * in window positions plus `headwin`, the exact window string at
    * span_start, which is how d10 resolves a span to its keeper (the
    * head window is duplicated by construction, so it always resolves). */
  private def spanFrames(s: SparkSession, dir: String, W: Int,
      minDocs: Int, whereSql: String,
      textSql: String = "text"): (DataFrame, DataFrame) = {
    // coalesce guards NULL text: Spark's size(split(NULL)) is -1
    // while DuckDB's len(NULL) is NULL — a NULL-text doc would
    // diverge the differential gate (round 11 ADVICE); with '' both
    // engines agree everywhere (no windows, n_toks = 1, n_removed 0)
    val docsT = slicedDocs(s, dir, whereSql, textSql)
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
    // Window hashes come from ONE codegen'd byte pass per document
    // (graft.functions.WindowHashes) — bit-identical to
    // xxhash64(array_join(slice(split(text,' '), i, W), ' ')) but with
    // zero window-string allocations. Until r16 BOTH legs built every
    // window string (~W× the corpus in UTF8String allocations through
    // an interpreted transform lambda) only to hash-and-drop ~all of
    // them; now strings are built only for the candidate subset.
    // pos is 1-based long: the oracle's range() yields BIGINT and the
    // gate compares schemas.
    val candH = docsT
      .select(col("doc_id"), explode(WindowHashes(col("text"), W)).as("wh"))
      // Candidate hashes: ≥ minDocs distinct docs. Two-level group
      // (wh, doc_id) then wh keeps the distinct-count a plain
      // map-side-combinable agg.
      .select(col("wh"), col("doc_id")).distinct()
      .groupBy(col("wh")).agg(count(lit(1)).as("nd"))
      .where(col("nd") >= minDocs).select(col("wh"))
    // Confirm leg, §8-shaped: decide on the 8-byte (doc_id, pos, wh)
    // proxy rows, then re-attach the heavy window STRING only for the
    // few candidate positions via a doc_id join-back (docsT's doc_id is
    // unique, so the inner join is 1:1 on the candidate side).
    val posHashes = docsT
      .select(col("doc_id"), posexplode(WindowHashes(col("text"), W)))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("wh"))
    // The candidate frame is consumed twice (confirm + position join):
    // persist it (d3's tagged-frame idiom, same cache + per-corpus
    // eviction) or the WHOLE upstream — both corpus scans and the
    // candidate shuffle — re-runs per consumer (4 corpus scans, the
    // exact DAG-reuse trap round 10 removed from d3).
    val cand0 = posHashes.join(candH, Seq("wh"), "left_semi")
      .join(docsT, Seq("doc_id"))
      .select(col("doc_id"), col("pos"),
        expr(s"array_join(slice(split(text, ' '), cast(pos AS int), $W), ' ')")
          .as("win"))
    val cand = cand0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Option(taggedCache.put(
        s"d9cand:$dir:$W:$minDocs:$whereSql:$textSql:${corpusStamp(s, dir, "documents")}",
        cand))
      .foreach(_.unpersist(false))
    // Exact confirm on the candidate subset: same STRING in ≥ minDocs
    // docs. min(doc_id) over the distinct (win, doc_id) frame doubles
    // as the keeper for d10's apply step.
    val dupWin = cand.select(col("win"), col("doc_id")).distinct()
      .groupBy(col("win"))
      .agg(count(lit(1)).as("nd"), min(col("doc_id")).as("keeper"))
      .where(col("nd") >= minDocs).select(col("win"), col("keeper"))
    val dupPos = cand.join(dupWin.select("win"), Seq("win"), "left_semi")
      .select(col("doc_id"), col("pos"), col("win"))
    val ord = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val spans = dupPos
      .withColumn("grp", col("pos") - row_number().over(ord))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("span_start"), max(col("pos")).as("last_w"),
        min_by(col("win"), col("pos")).as("headwin"))
      .select(col("doc_id"), col("span_start"), col("last_w"), col("headwin"))
    (dupWin, spans)
  }

  /** The oracle needs no hash leg: DuckDB groups the window strings
    * directly (single-node, exactness is free), which is by
    * construction the same dup set the engine's candidate+confirm
    * two-phase converges to. Scale-portable — no absolute thresholds.
    * Parametric for the same (W, minDocs, whereSql) space as
    * [[spanDetect]]; the gate's d9 uses the defaults. */
  private[graft] def d9SqlFor(W: Int, minDocs: Int, whereSql: String,
      textSql: String = "text"): String = {
    val where = if (whereSql.isEmpty) "" else s" WHERE $whereSql"
    s"""
    WITH toks AS (
      SELECT doc_id, string_split(coalesce(text, ''), ' ') AS t FROM ${TextAnalysis.corpusRef(textSql)}$where
    ), wins AS (
      SELECT doc_id, i AS pos, array_to_string(t[i:i+${W - 1}], ' ') AS win
      FROM toks, UNNEST(range(1, len(t) - $W + 2)) AS u(i)
    ), dup AS (
      SELECT win FROM wins GROUP BY win HAVING count(DISTINCT doc_id) >= $minDocs
    ), dw AS (
      SELECT w.doc_id, w.pos FROM wins w JOIN dup d USING (win)
    ), isl AS (
      SELECT doc_id, pos,
        pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      FROM dw)
    SELECT doc_id, min(pos) AS span_start,
      max(pos) + ${W - 1} AS span_end,
      max(pos) - min(pos) + $W AS span_toks
    FROM isl GROUP BY doc_id, grp"""
  }
  private val d9Sql = d9SqlFor(d9WindowTokens, 2, "")

  // ------------------------------------------------------------ d10 apply

  /** Apply d9's span findings to the corpus — what Lee et al. 2022
    * actually do to training data: every duplicated span is CUT from
    * the text everywhere except one canonical copy. The keeper of a
    * span is the minimum doc_id containing the span's head window
    * (exact string — deterministic, resolvable from [[spanFrames]]'
    * dupWin frame without another corpus pass); a doc can keep one of
    * its spans and lose another.
    *
    * Rebuild is per-doc and linear: explode tokens with positions,
    * anti-join the removed positions, re-assemble with an
    * `array_sort(collect_list(struct(pos, tok)))` — per-doc state, no
    * skew surface (docs are bounded). Single-space tokenization
    * round-trips exactly (split/join preserve even empty tokens from
    * consecutive spaces). Output: (doc_id, clean_text, n_removed) for
    * EVERY doc — untouched docs pass through with n_removed = 0, a
    * fully-duplicated non-keeper doc becomes the empty string. */
  def d10_span_apply(s: SparkSession, dir: String): DataFrame =
    spanApply(s, dir, d9WindowTokens, 2, "")

  /** Parametric span apply ([[d10_span_apply]] = the gate defaults);
    * same (W, minDocs, whereSql) space as [[spanDetect]]. */
  private[graft] def spanApply(s: SparkSession, dir: String, w: Int,
      minDocs: Int, whereSql: String, textSql: String = "text"): DataFrame = {
    val (dupWin, spans) = spanFrames(s, dir, w, minDocs, whereSql, textSql)
    val removed = spans
      .join(dupWin.withColumnRenamed("win", "headwin"), Seq("headwin"))
      .where(col("doc_id") =!= col("keeper"))
      .select(col("doc_id"),
        explode(expr(s"sequence(span_start, last_w + ${w - 1})")).as("pos"))
    val toks = slicedDocs(s, dir, whereSql, textSql)
      .select(col("doc_id"), posexplode(split(coalesce(col("text"), lit("")), " ")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("tok"))
    val rebuilt = toks.join(removed, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(expr("array_join(transform(array_sort(collect_list(struct(pos, tok))), x -> x.tok), ' ')")
          .as("clean_text"),
        count(lit(1)).as("n_kept"))
    slicedDocs(s, dir, whereSql, textSql)
      .select(col("doc_id"),
        size(split(coalesce(col("text"), lit("")), " ")).cast("long").as("n_toks"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        (col("n_toks") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }

  /** Mirrors d10: same dup/keeper/span derivation as [[d9Sql]] plus
    * `arg_min(win, pos)` for the head window and a
    * `string_agg(... ORDER BY pos)` rebuild. The LEFT JOIN from
    * `documents` keeps untouched and fully-cut docs in the output. */
  private[graft] def d10SqlFor(W: Int, minDocs: Int, whereSql: String,
      textSql: String = "text"): String = {
    val where = if (whereSql.isEmpty) "" else s" WHERE $whereSql"
    s"""
    WITH toks AS (
      SELECT doc_id, string_split(coalesce(text, ''), ' ') AS t FROM ${TextAnalysis.corpusRef(textSql)}$where
    ), wins AS (
      SELECT doc_id, i AS pos, array_to_string(t[i:i+${W - 1}], ' ') AS win
      FROM toks, UNNEST(range(1, len(t) - $W + 2)) AS u(i)
    ), dup AS (
      SELECT win, min(doc_id) AS keeper FROM wins
      GROUP BY win HAVING count(DISTINCT doc_id) >= $minDocs
    ), dw AS (
      SELECT w.doc_id, w.pos, w.win FROM wins w JOIN dup d USING (win)
    ), isl AS (
      SELECT doc_id, pos, win,
        pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      FROM dw
    ), spans AS (
      SELECT doc_id, min(pos) AS s, max(pos) + ${W - 1} AS e,
        arg_min(win, pos) AS headwin
      FROM isl GROUP BY doc_id, grp
    ), removed AS (
      SELECT sp.doc_id, u.p AS pos
      FROM spans sp JOIN dup d ON sp.headwin = d.win AND sp.doc_id <> d.keeper,
        UNNEST(range(sp.s, sp.e + 1)) AS u(p)
    ), tok AS (
      SELECT doc_id, i AS pos, t[i] AS tok
      FROM toks, UNNEST(range(1, len(t) + 1)) AS u(i)
    ), kept AS (
      SELECT k.doc_id, k.pos, k.tok FROM tok k
      LEFT JOIN removed r ON k.doc_id = r.doc_id AND k.pos = r.pos
      WHERE r.doc_id IS NULL
    ), rebuilt AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
        count(*) AS n_kept
      FROM kept GROUP BY doc_id)
    SELECT d.doc_id, coalesce(r.clean_text, '') AS clean_text,
      len(t.t) - coalesce(r.n_kept, 0) AS n_removed
    FROM documents d
    JOIN toks t ON d.doc_id = t.doc_id
    LEFT JOIN rebuilt r ON d.doc_id = r.doc_id"""
  }
  private val d10Sql = d10SqlFor(d9WindowTokens, 2, "")

  /** URL/host-level dedup canonicalization — the other standard
    * pretraining dedup key (CCNet/C4 fetch dedup): normalize each
    * document's URL and group by the canonical form. The documents
    * table carries no URL, so the query SYNTHESIZES one per document
    * from (source, doc_id) with deterministic doc_id-keyed variations
    * — scheme case and http/https flips, `www.` prefixes, upper-cased
    * hosts, explicit default ports, trailing slashes, tracking params
    * (utm_ / fbclid / gclid) in shuffled positions, fragments — exactly
    * mirrored in the oracle's SQL (the t10/m4 synthesized-input
    * posture). Documents sharing `doc_id div 7` synthesize variants
    * of the SAME logical page, so canonicalization must collapse
    * each 7-ish-doc group to one row.
    *
    * Canonicalization is GENERIC string work, not an inverse of the
    * synthesis: strip fragment, drop scheme, lowercase host, strip
    * `www.`, strip explicit default ports, strip trailing slashes,
    * drop tracking params and re-sort the survivors. All builtin
    * string/array expressions (regexp_replace/substring_index are
    * codegen'd; filter/sort_array are native set expressions) — one
    * corpus scan, one map-side-combined groupBy on a short key; the
    * same plan at 100 TB (canonical-URL cardinality ~ page count, and
    * the group key is bounded-length, so no skew surface beyond what
    * AQE handles).
    *
    * Output: one row per canonical URL with its md5, group size, and
    * keeper (min doc_id). */
  def d12_url_dedup(s: SparkSession, dir: String): DataFrame = {
    val raw = docs(s, dir).select(col("doc_id"),
      expr("doc_id div 7").as("page"))
      // page-keyed site (NOT the per-doc source column — the variants
      // of one logical page must share a host or nothing collapses)
      .withColumn("site", concat(lit("site"), (col("page") % 13).cast("string")))
      .withColumn("raw_url", concat(
        // scheme: https / HTTP:// case+protocol flips
        when(col("doc_id") % 2 === 0, lit("https://")).otherwise(lit("HTTP://")),
        // host: optional www., source-keyed domain, sometimes upper-cased
        when(col("doc_id") % 5 === 0,
          upper(concat(when(col("doc_id") % 3 === 0, lit("www.")).otherwise(lit("")),
            col("site"), lit(".example.com"))))
          .otherwise(concat(when(col("doc_id") % 3 === 0, lit("www.")).otherwise(lit("")),
            col("site"), lit(".example.com"))),
        // explicit default port on a quarter of the urls
        when(col("doc_id") % 4 === 0,
          when(col("doc_id") % 2 === 0, lit(":443")).otherwise(lit(":80")))
          .otherwise(lit("")),
        lit("/a/"), col("page").cast("string"),
        when(col("doc_id") % 6 === 0, lit("/")).otherwise(lit("")),
        // query string: tracking params by residue, the one REAL param
        // (id=..., page-keyed so the group stays coherent) spliced
        // before or after them
        {
          val kept = when(col("page") % 2 === 0,
            concat(lit("id="), (col("page") % 89).cast("string"))).otherwise(lit(""))
          val tracking = when(col("doc_id") % 4 === 1, lit("utm_source=feed&fbclid=abc"))
            .when(col("doc_id") % 4 === 2, lit("utm_campaign=x"))
            .when(col("doc_id") % 4 === 3, lit("gclid=g123&utm_medium=m"))
            .otherwise(lit(""))
          val joined = when(kept === "" && tracking === "", lit(""))
            .when(kept === "", tracking)
            .when(tracking === "", kept)
            .when(col("doc_id") % 8 < 4, concat(tracking, lit("&"), kept))
            .otherwise(concat(kept, lit("&"), tracking))
          when(joined === "", lit("")).otherwise(concat(lit("?"), joined))
        },
        when(col("doc_id") % 9 === 0, lit("#s2")).otherwise(lit(""))))
    val canon = raw
      .withColumn("u1", substring_index(col("raw_url"), "#", 1))
      .withColumn("rest", regexp_replace(col("u1"), "^[a-zA-Z]+://", ""))
      .withColumn("hostport", substring_index(col("rest"), "/", 1))
      .withColumn("pathq", expr("substring(rest, length(hostport) + 1)"))
      .withColumn("host",
        regexp_replace(regexp_replace(lower(col("hostport")), ":(443|80)$", ""),
          "^www\\.", ""))
      .withColumn("path",
        regexp_replace(substring_index(col("pathq"), "?", 1), "/+$", ""))
      .withColumn("q",
        when(instr(col("pathq"), "?") > 0, substring_index(col("pathq"), "?", -1))
          .otherwise(lit("")))
      .withColumn("params", array_join(sort_array(filter(split(col("q"), "&"),
        p => !(p.startsWith("utm_") || p.startsWith("fbclid=") ||
          p.startsWith("gclid=") || p === ""))), "&"))
      .withColumn("canon_url", concat(col("host"), col("path"),
        when(col("params") === "", lit("")).otherwise(concat(lit("?"), col("params")))))
    canon.groupBy("canon_url")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper_doc_id"))
      .select(col("canon_url"), md5(col("canon_url").cast("binary")).as("url_md5"),
        col("n_docs"), col("keeper_doc_id"))
  }

  private val d12Sql = """
    WITH raw AS (
      SELECT doc_id,
        (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'HTTP://' END)
        || (CASE WHEN doc_id % 5 = 0
             THEN UPPER((CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END)
                        || 'site' || ((doc_id // 7) % 13) || '.example.com')
             ELSE (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END)
                  || 'site' || ((doc_id // 7) % 13) || '.example.com' END)
        || (CASE WHEN doc_id % 4 = 0
             THEN (CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE ':80' END)
             ELSE '' END)
        || '/a/' || (doc_id // 7)
        || (CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END)
        || (CASE WHEN joined = '' THEN '' ELSE '?' || joined END)
        || (CASE WHEN doc_id % 9 = 0 THEN '#s2' ELSE '' END) AS raw_url
      FROM (
        SELECT *, CASE WHEN kept = '' AND tracking = '' THEN ''
                       WHEN kept = '' THEN tracking
                       WHEN tracking = '' THEN kept
                       WHEN doc_id % 8 < 4 THEN tracking || '&' || kept
                       ELSE kept || '&' || tracking END AS joined
        FROM (
          SELECT doc_id,
            CASE WHEN (doc_id // 7) % 2 = 0
                 THEN 'id=' || ((doc_id // 7) % 89) ELSE '' END AS kept,
            CASE WHEN doc_id % 4 = 1 THEN 'utm_source=feed&fbclid=abc'
                 WHEN doc_id % 4 = 2 THEN 'utm_campaign=x'
                 WHEN doc_id % 4 = 3 THEN 'gclid=g123&utm_medium=m'
                 ELSE '' END AS tracking
          FROM documents) p) q),
    canon AS (
      SELECT doc_id,
        host || path
          || (CASE WHEN params = '' THEN '' ELSE '?' || params END) AS canon_url
      FROM (
        SELECT doc_id,
          REGEXP_REPLACE(REGEXP_REPLACE(LOWER(hostport), ':(443|80)$', ''),
            '^www\.', '') AS host,
          REGEXP_REPLACE(SPLIT_PART(pathq, '?', 1), '/+$', '') AS path,
          COALESCE(ARRAY_TO_STRING(LIST_SORT(LIST_FILTER(
            STRING_SPLIT(CASE WHEN STRPOS(pathq, '?') > 0
                              THEN SPLIT_PART(pathq, '?', 2) ELSE '' END, '&'),
            p -> NOT (p LIKE 'utm\_%' ESCAPE '\' OR p LIKE 'fbclid=%'
                      OR p LIKE 'gclid=%' OR p = ''))), '&'), '') AS params
        FROM (
          SELECT doc_id, hostport, SUBSTR(rest, LENGTH(hostport) + 1) AS pathq
          FROM (
            SELECT doc_id,
              REGEXP_REPLACE(SPLIT_PART(raw_url, '#', 1), '^[a-zA-Z]+://', '') AS rest,
              SPLIT_PART(REGEXP_REPLACE(SPLIT_PART(raw_url, '#', 1),
                '^[a-zA-Z]+://', ''), '/', 1) AS hostport
            FROM raw) h) x) y)
    SELECT canon_url, md5(canon_url) AS url_md5,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id
    FROM canon GROUP BY canon_url"""

  // --------------------------------------- d13 incremental index dedup

  /** Batch-side band count above which the ingest join rides a
    * shuffled hash join instead of broadcasting the batch — the
    * [[graft.pipeline.TextAnalysis.t13BcastMaxVocab]] dispatch
    * pattern. A day's crawl is usually broadcastable next to a 100-TB
    * index; a backfill-sized batch is not, and a forced hint would die
    * on broadcast limits instead of degrading. */
  private[graft] val d13BcastMaxBatch = 4000000L

  /** Which side of the [[d13BcastMaxBatch]] dispatch the last
    * [[incrementalDedup]] took ("bcast" | "shuffle") — read back by
    * fuzz runners ([[lastSemanticDispatch]] pattern). */
  @volatile private[graft] var lastIncrementalDispatch: String = ""

  /** One persisted band index per (corpus, slice): built and written
    * ONCE per JVM (content-stamped, so a grown corpus rebuilds), then
    * every ingest batch reads the parquet back — the production
    * contract where the index table outlives any single batch. */
  private val d13IndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Build (once) and return the parquet path of the MinHash band
    * index over `corpusWhere`-selected documents. */
  private[graft] def d13IndexPath(s: SparkSession, dir: String,
      corpusWhere: String): String =
    d13IndexCache.computeIfAbsent(
      s"$dir:$corpusWhere:${corpusStamp(s, dir, "documents")}", _ => {
        val p = java.nio.file.Files.createTempDirectory("graft_d13_index")
          .resolve("bands.parquet").toString
        minhashBands(s, dir, corpusWhere).write.mode("overwrite").parquet(p)
        p
      })

  /** Admit a batch's band rows into an existing index table: a plain
    * parquet append — new files land next to the old, nothing is
    * rewritten (at fleet scale this is the partition-add every table
    * format does atomically). */
  private[graft] def d13UpdateIndex(s: SparkSession, indexPath: String,
      newBands: DataFrame): Unit =
    newBands.write.mode("append").parquet(indexPath)

  /** INCREMENTAL corpus-index dedup — the production ingest shape
    * none of d1–d12 covers: the EXISTING corpus's MinHash band index
    * is a persisted table (built once, here memoized per corpus), and
    * each incoming batch is deduplicated against it by sketching ONLY
    * the batch — a pipeline never re-sketches 100 TB to admit a day's
    * crawl. Gate split: batch = pmod(doc_id, 7) = 0, corpus = the
    * rest.
    *
    * Plan, 100 TB-first: the index side is a straight parquet scan of
    * the band table — it never re-shuffles (batch bands broadcast
    * under [[d13BcastMaxBatch]], so the index⋈batch join is map-side;
    * above the cut both sides ride one shuffled hash join, the
    * backfill path). Batch-internal dups come from [[bucketPairs]]
    * over the batch bands alone (hot-bucket tiled, batch-sized).
    * Result ≡ full-corpus [[d3_dedup_minhash]] restricted to pairs
    * touching the batch — the DuckDB oracle states exactly that.
    *
    * Output: (doc_a, doc_b, est_jaccard), doc_a < doc_b, signature
    * agreement ≥ 0.75, at least one side in the batch. */
  def d13_dedup_incremental(s: SparkSession, dir: String): DataFrame =
    incrementalDedup(s, dir, "0.75", 7)

  /** Parametric form ([[d13_dedup_incremental]] = gate defaults):
    * agreement threshold, batch residue modulus, and the broadcast
    * cut (movable so specs/fuzz exercise both dispatch sides). */
  private[graft] def incrementalDedup(s: SparkSession, dir: String,
      theta: String, batchMod: Int,
      bcastMax: Long = d13BcastMaxBatch): DataFrame = {
    val batchWhere = s"((doc_id % $batchMod) + $batchMod) % $batchMod = 0"
    val corpusWhere = s"((doc_id % $batchMod) + $batchMod) % $batchMod <> 0"
    val index = s.read.parquet(d13IndexPath(s, dir, corpusWhere))
    val batch = minhashBands(s, dir, batchWhere)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nBatch = batch.count()
    lastIncrementalDispatch = if (nBatch <= bcastMax) "bcast" else "shuffle"
    val batchSide = if (nBatch <= bcastMax) broadcast(batch)
      else batch.hint("shuffle_hash")
    val bandCols = Seq("band", "h1", "h2", "h3", "h4")
    val onBand = bandCols.map(c => col(s"a.$c") === col(s"b.$c")).reduce(_ && _)
    // corpus×batch collisions: ids are residue-disjoint, so
    // least/greatest is the d3 doc_a < doc_b normalization. The
    // explicit a≠b guard matters once d13UpdateIndex has admitted a
    // batch's bands into the index (the production flow): a batch doc
    // joined to its own index copy must not emit a (d, d, 1.0)
    // self-pair the oracle's doc_a < doc_b candidate rule excludes.
    val cross = index.as("a")
      .join(batchSide.as("b"), onBand && col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"),
        minhashAgree.as("est_jaccard"))
    // batch-internal collisions: d3's tiled self-join, batch-sized
    val within = bucketPairs(batch, bandCols, "doc_id", d3ChunkSize,
        s"d13:$dir:$batchMod:${corpusStamp(s, dir, "documents")}")
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        minhashAgree.as("est_jaccard"))
    cross.unionAll(within)
      .filter(col("est_jaccard") >= expr(theta))
      .distinct()
  }

  private[graft] def d13SqlFor(theta: String, batchMod: Int): String = s"""
    WITH ${d3CtesFor(theta, "")}
    SELECT doc_a, doc_b, est_jaccard FROM cand
    WHERE ((doc_a % $batchMod) + $batchMod) % $batchMod = 0
       OR ((doc_b % $batchMod) + $batchMod) % $batchMod = 0"""
  private val d13Sql = d13SqlFor("0.75", 7)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d13_dedup_incremental" -> (d13_dedup_incremental _),
    "d12_url_dedup" -> (d12_url_dedup _),
    "d1_dedup_exact" -> (d1_dedup_exact _),
    "d2_dedup_ngram" -> (d2_dedup_ngram _),
    "d3_dedup_minhash" -> (d3_dedup_minhash _),
    "d6_dedup_apply" -> (d6_dedup_apply _),
    "d4_dedup_simhash" -> (d4_dedup_simhash _),
    "d5_dedup_embedding" -> (d5_dedup_embedding _),
    "d7_dedup_clusters" -> (d7_dedup_clusters _),
    "d8_dedup_semantic" -> (d8_dedup_semantic _),
    "d9_dedup_spans" -> (d9_dedup_spans _),
    "d10_span_apply" -> (d10_span_apply _),
    "d11_decontaminate" -> (d11_decontaminate _))

  val oracle: Map[String, String] = Map(
    "d13_dedup_incremental" -> d13Sql,
    "d12_url_dedup" -> d12Sql,
    "d1_dedup_exact" -> d1Sql,
    "d2_dedup_ngram" -> d2Sql,
    "d3_dedup_minhash" -> d3Sql,
    "d6_dedup_apply" -> d6Sql,
    "d4_dedup_simhash" -> d4Sql,
    "d5_dedup_embedding" -> d5Sql,
    "d7_dedup_clusters" -> d7Sql,
    "d8_dedup_semantic" -> d8Sql,
    "d9_dedup_spans" -> d9Sql,
    "d10_span_apply" -> d10Sql,
    "d11_decontaminate" -> d11Sql)
}
