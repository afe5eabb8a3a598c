package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Tables

/** Dataset-curation operators over `documents` — the corpus-shaping
  * stages of a training-data pipeline that sit between text analysis
  * ([[TextAnalysis]]) and deduplication ([[Dedup]]):
  *
  *   - c1 hash split:     deterministic train/val/test assignment
  *                        (salted multiplicative hash of the stable id;
  *                        reproducible across runs/cluster sizes, no
  *                        `rand()` anywhere)
  *   - c2 stratified:     per-language quota sampling via window
  *                        row_number over a hash ordering — balanced
  *                        class representation without a global sort
  *   - c3 vocabulary:     corpus token vocabulary (term + document
  *                        frequency), the tokenizer-training input
  *   - c4 TF-IDF:         top-scored terms per document; idf as an
  *                        exact integer rational (tf·1e6·N div df) so
  *                        the score is reproducible bit-for-bit (no
  *                        transcendental `ln` whose last-ulp behavior
  *                        differs across libm implementations)
  *   - c5 edit distance:  length-blocked pairwise Levenshtein near-dup
  *                        candidates (the blocking key bounds pair
  *                        fan-out, same scaling idea as d2's rare-gram
  *                        cut)
  *   - c6 pivot:          source × language document-count matrix
  *                        (Spark `pivot` ≡ conditional aggregation)
  *
  * All arithmetic is exact int64 (positive operands, so `%`/`div`
  * agree across engines) or plain counts — every op hash-matches its
  * DuckDB oracle. Scale: c1/c2/c4 shuffle once on their natural key;
  * c3 is a two-level aggregation with map-side partial agg; c5's
  * shuffle key is the blocking key, never the text cross product.
  */
object Curation {

  private val P = Hashing.P // 2^31 - 1

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  // ------------------------------------------------------- c1 hash split

  /** Deterministic train/val/test split: bucket = salted multiplicative
    * hash of doc_id mod 100 → 80/10/10. Assignment is a pure function
    * of the row id — stable under repartitioning, cluster resize and
    * re-runs, which `rand()`-based splits are not. */
  def c1_split_hash(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"),
        expr(s"((doc_id * CAST(2654435761 AS BIGINT) + 104729) % $P) % 100").as("bucket"))
      .withColumn("split",
        when(col("bucket") < 80, lit("train"))
          .when(col("bucket") < 90, lit("val"))
          .otherwise(lit("test")))

  private val c1Sql = s"""
    SELECT doc_id,
      ((doc_id * CAST(2654435761 AS BIGINT) + 104729) % $P) % 100 AS bucket,
      CASE WHEN ((doc_id * CAST(2654435761 AS BIGINT) + 104729) % $P) % 100 < 80 THEN 'train'
           WHEN ((doc_id * CAST(2654435761 AS BIGINT) + 104729) % $P) % 100 < 90 THEN 'val'
           ELSE 'test' END AS split
    FROM documents"""

  // ------------------------------------------------- c2 stratified sample

  /** Stratified sampling: first 20 docs per language under a
    * deterministic hash ordering. One shuffle on `lang`; the per-group
    * heap never exceeds the quota at any scale. */
  def c2_stratified_sample(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("lang")
      .orderBy(col("ord"), col("doc_id"))
    docs(s, dir)
      .select(col("doc_id"), col("lang"),
        expr(s"(doc_id * 40503 + 17) % $P").as("ord"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 20)
      .select("doc_id", "lang", "rn")
  }

  private val c2Sql = s"""
    SELECT doc_id, lang, rn FROM (
      SELECT doc_id, lang,
        CAST(ROW_NUMBER() OVER (
          PARTITION BY lang
          ORDER BY (doc_id * 40503 + 17) % $P, doc_id) AS BIGINT) AS rn
      FROM documents)
    WHERE rn <= 20"""

  // ------------------------------------------------------- c3 vocabulary

  /** Corpus vocabulary: top-100 tokens by term frequency, with document
    * frequency. explode → two-level aggregate (map-side partial), then
    * TakeOrdered for the top-k — no full sort. */
  def c3_vocab(s: SparkSession, dir: String): DataFrame =
    graft.operators.Tables.widen(docs(s, dir))
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token")
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("tf").desc, col("token"))
      .limit(100)

  private val c3Sql = """
    WITH tok AS (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents)
    SELECT token, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
    FROM tok WHERE token <> ''
    GROUP BY token
    ORDER BY tf DESC, token
    LIMIT 100"""

  // ----------------------------------------------------------- c4 TF-IDF

  /** Top-3 TF-IDF terms per document. The idf is the exact rational
    * `tf * 1e6 * N div df` (integer division) rather than a float
    * `ln(N/df)` — same ranking for fixed N, and bit-reproducible on any
    * engine/libm. Two aggregations (per-doc tf, per-token df) joined on
    * `token`; N arrives via a broadcast single-row count. */
  def c4_tfidf(s: SparkSession, dir: String): DataFrame = {
    val tok = graft.operators.Tables.widen(docs(s, dir))
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
    val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    // df is derivable from tf — (doc_id, token) is unique after the
    // aggregate, so COUNT(*) per token over tf ≡ COUNT(DISTINCT
    // doc_id) per token over the raw token stream. Window-counting it
    // on tf removes the second corpus scan + explode AND the
    // distinct-aggregate shuffle of the full token stream (the widest
    // frame in this query); the window's exchange carries the already-
    // aggregated tf table instead.
    //
    // Skew-probed at sf1p on the maximal-skew corpus (31-token
    // vocabulary — every window group is ~n_docs rows, the stopword
    // worst case): window 1.55 s vs groupBy+join-back 3.29 s (plain)
    // / 2.08 s (broadcast hint) — the join-back re-derives tf for the
    // df side, i.e. pays a second corpus explode, which dominates any
    // skew gain at every tested scale. If a single token group ever
    // outgrew one task's window buffer at true fleet scale, the fix is
    // two-level (salted) counting over tf, not the join-back.
    val n = docs(s, dir).agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("token"))
    tf.withColumn("df", count(lit(1)).over(Window.partitionBy("token")))
      .crossJoin(broadcast(n))
      .withColumn("score", expr("(tf * 1000000 * n_docs) div df"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("doc_id", "token", "tf", "df", "score", "rn")
  }

  private val c4Sql = """
    WITH tok AS (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents),
    tok2 AS (SELECT doc_id, token FROM tok WHERE token <> ''),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok2 GROUP BY 1, 2),
    df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok2 GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT doc_id, token, tf, df, score, rn FROM (
      SELECT t.doc_id, t.token, t.tf, d.df,
        (t.tf * 1000000 * n.n_docs) // d.df AS score,
        CAST(ROW_NUMBER() OVER (
          PARTITION BY t.doc_id
          ORDER BY (t.tf * 1000000 * n.n_docs) // d.df DESC, t.token) AS BIGINT) AS rn
      FROM tf t JOIN df d ON t.token = d.token CROSS JOIN n)
    WHERE rn <= 3"""

  // ------------------------------------------------ c5 edit-distance dedup

  /** Alphabet for [[c5_editdist_pairs]]'s character-histogram bound
    * (the corpus is lowercase words; characters outside the set only
    * WEAKEN the bound — it stays sound for arbitrary text). */
  private val c5Alphabet = " abcdefghijklmnopqrstuvwxyz"

  /** Length-blocked Levenshtein near-dup candidates: pairs share the
    * (lang, n_chars div 16) blocking key, distance computed on the
    * 40-char prefix. The equality blocking key is the join/shuffle key,
    * so candidate fan-out is bounded per block — the same
    * linear-not-quadratic discipline as d2's rare-gram cut. (On this
    * corpus the distance distribution is bimodal: true dups at 0,
    * unrelated text at ≥ 15 on the 40-char prefix — threshold 10 sits
    * in the gap, and the shorter prefix halves the DP cost.)
    *
    * Three scale refinements over the naive blocked cross-check, all
    * output-invariant (the UNCHANGED DuckDB oracle below is the
    * proof — the gate hash-compares against the plain formulation):
    *
    *  1. SHUFFLE_HASH on the block key with an EXPLICIT-count
    *     repartition of both sides: a broadcast would run the whole
    *     probe as one task per input split, and even a shuffle join
    *     gets AQE-coalesced to one partition because the pre-join
    *     input (~200 B/doc) looks tiny — AQE sizes partitions on
    *     exchange INPUT and cannot see an explosive join's output
    *     (both measured single-threaded at 10× gate scale). The
    *     explicit 2·defaultParallelism count is exempt from AQE
    *     coalescing, both sides share the partitioning so the join
    *     inserts no further exchange, and the ~168 blocks spread
    *     across every core/executor — the 100-TB join shape.
    *  2. Character-histogram lower bound: lev(a,b) ≥ L1(hist(a),
    *     hist(b))/2, so a pair whose per-letter count L1 exceeds 2·10
    *     can never pass. Counts are computed once per DOC (codegen'd
    *     length/replace over [[c5Alphabet]]), the pair-level test is
    *     27 int abs-diffs — it rejects ~81% of candidates (measured,
    *     0 false rejects) before any DP.
    *  3. Thresholded Levenshtein (`levenshtein(a, b, 10)`): banded
    *     O(len·k) DP with early abandon instead of O(len²). */
  def c5_editdist_pairs(s: SparkSession, dir: String): DataFrame = {
    val base = Seq("doc_id", "lang", "blk", "prefix")
    val d = docs(s, dir).select(col("doc_id"), col("lang"),
        expr("n_chars div 16").as("blk"),
        substring(col("text"), 1, 40).as("prefix"))
      .select(base.map(col) ++ c5Alphabet.zipWithIndex.map { case (c, i) =>
        (length(col("prefix")) -
          length(replace(col("prefix"), lit(c.toString), lit("")))).cast("int").as(s"c$i")
      }: _*)
    val a = d.toDF("a_id" +: base.tail ++: c5Alphabet.indices.map(i => s"ca$i"): _*)
      .withColumnRenamed("prefix", "a_prefix")
    val b = d.toDF("b_id" +: base.tail ++: c5Alphabet.indices.map(i => s"cb$i"): _*)
      .withColumnRenamed("prefix", "b_prefix")
    val histL1 = c5Alphabet.indices.map(i => abs(col(s"ca$i") - col(s"cb$i"))).reduce(_ + _)
    val nPart = s.sparkContext.defaultParallelism * 2
    a.repartition(nPart, col("lang"), col("blk")).hint("shuffle_hash")
      .join(b.repartition(nPart, col("lang"), col("blk")), Seq("lang", "blk"))
      .filter(col("a_id") < col("b_id") && histL1 <= lit(20))
      .withColumn("lev", levenshtein(col("a_prefix"), col("b_prefix"), 10).cast("long"))
      .filter(col("lev") >= 0 && col("lev") <= 10)
      .select(col("a_id"), col("b_id"), col("lang"), col("blk"), col("lev"))
  }

  /** The oracle partitions the probe side into 16 residue-class
    * slices UNION ALL'd back together — output-identical (the slices
    * partition `a.doc_id`, so every qualifying pair appears in exactly
    * one branch) but 15× faster in DuckDB, which parallelizes by
    * ~122k-row morsels: the unsliced probe side is a single morsel at
    * every gate scale, so the whole quadratic levenshtein ran on ONE
    * thread (measured 65 s at sf1p, ~3 h at sf10p; sliced: 4.4 s at
    * sf1p). The branches execute as concurrent pipelines. */
  private val c5Sql = {
    val k = 16
    val branches = (0 until k).map { i =>
      s"""SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.lang, a.blk,
      CAST(levenshtein(a.prefix, b.prefix) AS BIGINT) AS lev
    FROM d a JOIN d b
      ON a.lang = b.lang AND a.blk = b.blk AND a.doc_id < b.doc_id
    WHERE ((a.doc_id % $k) + $k) % $k = $i AND levenshtein(a.prefix, b.prefix) <= 10"""
    }.mkString("\n    UNION ALL\n    ")
    s"""
    WITH d AS MATERIALIZED (
      SELECT doc_id, lang, n_chars // 16 AS blk, SUBSTRING(text, 1, 40) AS prefix
      FROM documents)
    $branches"""
  }

  // -------------------------------------------------------------- c6 pivot

  /** PIVOT: source × language document-count matrix. Spark's `pivot`
    * with explicit values compiles to conditional aggregation — one
    * hash aggregate, map-side partial, no extra shuffle vs a plain
    * GROUP BY. */
  def c6_pivot(s: SparkSession, dir: String): DataFrame = {
    val langs = Seq("de", "en", "es", "fr", "zh")
    docs(s, dir)
      .groupBy("source")
      .pivot("lang", langs)
      .agg(count(lit(1)))
      .na.fill(0L, langs)
      .select(col("source") +: langs.map(l => col(l).cast("long").as(l)): _*)
  }

  // CAST AS BIGINT: DuckDB SUM over ints yields HUGEINT (arrow
  // decimal128), which the driver's type-sensitive hash rejects
  // against Spark's int64 even when values agree.
  private val c6Sql = """
    SELECT source,
      CAST(SUM(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS de,
      CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS en,
      CAST(SUM(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS es,
      CAST(SUM(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS fr,
      CAST(SUM(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS zh
    FROM documents
    GROUP BY source"""

  // ------------------------------------------------- c7 sequence packing

  /** Sequence packing: assign documents to fixed token-budget packs
    * (2048 tokens) by running-total position — the standard streaming
    * packing for LLM pretraining batches. Packing runs within each
    * language shard (`partitionBy(lang)`), so at 100 TB each shard
    * packs independently — no global order, no single-partition
    * bottleneck; shards are the parallelism unit exactly like a real
    * pretraining data pipeline. Exact integer arithmetic throughout. */
  def c7_pack_sequences(s: SparkSession, dir: String): DataFrame = {
    val budget = 2048
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs(s, dir)
      .select(col("doc_id"), col("lang"),
        regexp_count(col("text"), lit("\\S+")).cast("long").as("toks"))
      .withColumn("cum_before", coalesce(sum(col("toks")).over(w), lit(0L)))
      .select(col("doc_id"), col("lang"), col("toks"),
        expr(s"cum_before div $budget").as("pack_id"),
        expr(s"cum_before % $budget").as("pack_offset"))
  }

  private val c7Sql = """
    SELECT doc_id, lang, toks,
      CAST(cum_before // 2048 AS BIGINT) AS pack_id,
      CAST(cum_before % 2048 AS BIGINT) AS pack_offset
    FROM (
      SELECT doc_id, lang,
        CAST(LEN(REGEXP_EXTRACT_ALL(text, '\S+')) AS BIGINT) AS toks,
        COALESCE(SUM(CAST(LEN(REGEXP_EXTRACT_ALL(text, '\S+')) AS BIGINT)) OVER (
          PARTITION BY lang ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM documents) t"""

  // --------------------------------------------- cp1 end-to-end pipeline

  /** The full curation pipeline as ONE composable DataFrame plan:
    * clean (stopword removal) → exact-dedup on the cleaned text
    * (keeper = min doc_id) → deterministic hash split → keep `train`
    * → sequence-pack per language. Every stage is the same code shape
    * as its standalone op (t5, d1, c1, c7); Catalyst fuses the
    * per-row stages into the scan projection, and the only shuffles
    * are the dedup hash-group and the per-language packing window. */
  def cp1_pipeline(s: SparkSession, dir: String): DataFrame = {
    val stop = "\\b(the|a|of|and|to|in|is|it)\\b"
    val cleaned = docs(s, dir).select(col("doc_id"), col("lang"),
      trim(regexp_replace(regexp_replace(col("text"), stop, ""), " +", " "))
        .as("clean"))
    // partition by the DIGEST, not the text: the shuffle key must stay
    // fixed-width at corpus scale (same discipline as d1 — shipping
    // whole documents as exchange keys doubles the dominant shuffle)
    val keep = Window.partitionBy(md5(col("clean")))
    val deduped = cleaned
      .withColumn("keeper", min(col("doc_id")).over(keep))
      .filter(col("doc_id") === col("keeper"))
    val split = deduped.withColumn("bucket",
        expr(s"((doc_id * CAST(2654435761 AS BIGINT) + 104729) % $P) % 100"))
      .filter(col("bucket") < 80) // train
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    split
      .select(col("doc_id"), col("lang"),
        regexp_count(col("clean"), lit("\\S+")).cast("long").as("toks"))
      .withColumn("cum_before", coalesce(sum(col("toks")).over(w), lit(0L)))
      .select(col("doc_id"), col("lang"), col("toks"),
        expr("cum_before div 2048").as("pack_id"))
  }

  private val cp1Sql = """
    WITH cleaned AS (
      SELECT doc_id, lang,
        TRIM(REGEXP_REPLACE(REGEXP_REPLACE(text, '\b(the|a|of|and|to|in|is|it)\b', '', 'g'), ' +', ' ', 'g')) AS clean
      FROM documents),
    deduped AS (
      SELECT * FROM (
        SELECT doc_id, lang, clean,
          MIN(doc_id) OVER (PARTITION BY clean) AS keeper
        FROM cleaned) t
      WHERE doc_id = keeper),
    train AS (
      SELECT doc_id, lang, clean FROM deduped
      WHERE ((doc_id * CAST(2654435761 AS BIGINT) + 104729) % 2147483647) % 100 < 80),
    toks AS (
      SELECT doc_id, lang,
        CAST(LEN(REGEXP_EXTRACT_ALL(clean, '\S+')) AS BIGINT) AS toks
      FROM train)
    SELECT doc_id, lang, toks,
      CAST(COALESCE(SUM(toks) OVER (PARTITION BY lang ORDER BY doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 2048 AS BIGINT) AS pack_id
    FROM toks"""

  // ------------------------------------------------- c8 decontamination

  /** Benchmark decontamination: flag training documents that share any
    * word 5-gram with the held-out eval set (docs with
    * `doc_id % 37 = 0` stand in for the benchmark suite) — the
    * standard n-gram-overlap contamination check run before
    * pretraining. The eval gram set is tiny by construction (a
    * benchmark is fixed-size while the corpus grows), so it is
    * BROADCAST and the 100 TB side is a single scan + broadcast-hash
    * join + per-doc count: no shuffle of the corpus grams at all. */
  def c8_decontaminate(s: SparkSession, dir: String): DataFrame = {
    // RAW gram occurrences — the per-doc dedup happens AFTER the
    // broadcast join: the eval-gram filter is the selective step (a
    // benchmark is fixed-size), so deduplicating only the matched
    // occurrences (countDistinct per doc) shuffles the match volume
    // instead of the full corpus gram set. The old shape paid a
    // global (doc_id, g) DISTINCT shuffle of every gram in the
    // corpus before the join — the widest exchange in this query —
    // for rows the join was about to drop. COUNT(DISTINCT g) per doc
    // over matches ≡ COUNT(*) per doc over pre-distincted matches.
    val tok = graft.operators.Tables.widen(docs(s, dir))
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 5)
      .select(col("doc_id"),
        explode(expr("transform(sequence(1, size(w)-4), i -> concat_ws(' ', slice(w, i, 5)))")).as("g"))
    val evalGrams = tok.filter(col("doc_id") % 37 === 0).select("g").distinct()
    tok.filter(col("doc_id") % 37 =!= 0)
      .join(broadcast(evalGrams), "g")
      .groupBy("doc_id")
      .agg(countDistinct(col("g")).cast("long").as("n_shared"))
  }

  private val c8Sql = """
    WITH grams AS (
      SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS g
      FROM (SELECT doc_id, w, UNNEST(range(1, LEN(w) - 3)) AS i
            FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents
                  WHERE LEN(STRING_SPLIT(text, ' ')) >= 5) a) b),
    ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 37 = 0)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM grams JOIN ev USING (g)
    WHERE doc_id % 37 <> 0
    GROUP BY doc_id"""

  // ---------------------------------------------- c9 global ordinals

  /** Gap-free global row numbering in the (lang, doc_id) order — the
    * "write sorted shards with global sample ordinals" step of a
    * pretraining data build. A naive
    * `ROW_NUMBER() OVER (ORDER BY …)` funnels 100 TB through ONE
    * window task; this is the scale-correct two-pass form, fully
    * declarative:
    *
    *   1. bucket rows by a key MONOTONE in the sort order
    *      (`(lang, doc_id div 1024)`), row_number within each bucket —
    *      bounded window partitions, full parallelism;
    *   2. bucket row-counts (a metadata-sized aggregate) → running
    *      offsets via a window over that tiny table → broadcast join
    *      back, ordinal = bucket offset + local row number.
    *
    * The corpus-sized side shuffles once (the bucket window); the
    * global ordering state lives only in the offsets table (one row
    * per bucket). Same decomposition as Spark's own zipWithIndex, but
    * in DataFrame algebra with a deterministic bucket key, so the
    * oracle is a plain ROW_NUMBER. */
  def c9_global_ordinals(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("lang"),
      expr("doc_id div 1024").as("blk"))
    val wIn = Window.partitionBy("lang", "blk").orderBy("doc_id")
    val rn = d.withColumn("rn", row_number().over(wIn).cast("long"))
    val wOff = Window.orderBy("lang", "blk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = d.groupBy("lang", "blk").agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(sum("cnt").over(wOff), lit(0L)))
      .select("lang", "blk", "off")
    rn.join(broadcast(offs), Seq("lang", "blk"))
      .select(col("doc_id"), col("lang"), (col("rn") + col("off")).as("ordinal"))
  }

  private val c9Sql = """
    SELECT doc_id, lang,
      CAST(ROW_NUMBER() OVER (ORDER BY lang, doc_id) AS BIGINT) AS ordinal
    FROM documents"""

  // ---------------------------------------------------- c10 mixture sampling

  /** Data mixing: up/down-sample each language to a target mixture by
    * deterministic hash thresholding — the "sample web text at 30%,
    * code at 3×" step of assembling a pretraining mixture (weights are
    * per-mille keep rates; >1000 would mean duplication, done by the
    * packing stage instead). The weights table is mixture-spec-sized →
    * BROADCAST; the corpus side is one scan + filter, no shuffle at
    * all. Same reproducibility argument as c1: assignment is a pure
    * function of the stable id, unchanged under repartitioning or
    * cluster resize. */
  def c10_mixture(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val weights = Seq(("en", 1000L), ("de", 500L), ("fr", 250L),
      ("es", 125L), ("zh", 62L)).toDF("lang", "keep_permille")
    docs(s, dir)
      .select(col("doc_id"), col("lang"),
        expr(s"((doc_id * 48271 + 11) % $P) % 1000").as("h"))
      .join(broadcast(weights), "lang")
      .filter(col("h") < col("keep_permille"))
      .select(col("doc_id"), col("lang"), col("h"))
  }

  private val c10Sql = s"""
    SELECT doc_id, lang, ((doc_id * 48271 + 11) % $P) % 1000 AS h
    FROM documents
    WHERE ((doc_id * 48271 + 11) % $P) % 1000 <
      CASE lang WHEN 'en' THEN 1000 WHEN 'de' THEN 500 WHEN 'fr' THEN 250
                WHEN 'es' THEN 125 WHEN 'zh' THEN 62 ELSE 0 END"""

  // ---------------------------------------------------- c11 doc chunking

  /** Context-window chunking: split each document into fixed-width
    * character chunks with overlap (width 200, stride 160 → 40-char
    * overlap) — the "cut long documents into training-context-sized
    * windows" stage that runs right before sequence packing (c7
    * consumes per-sequence token budgets; this produces the
    * sequences). Fully shuffle-free: one scan, a per-row
    * `sequence`+`explode` (whole-stage codegen'd), output rows =
    * Σ ceil((len−overlap)/stride) — the plan is a single codegen span
    * regardless of corpus size, so it scales embarrassingly at
    * 100 TB. Chunk count is exact integer arithmetic (no float
    * `ceil`): n = max((len − overlap − 1) div stride + 1, 1). */
  def c11_chunk_docs(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text"),
        expr("greatest((CAST(length(text) AS BIGINT) - 41) div 160 + 1, CAST(1 AS BIGINT))")
          .as("n_chunks"))
      .select(col("doc_id"), col("n_chunks"),
        explode(expr("sequence(0L, n_chunks - 1)")).as("chunk_idx"), col("text"))
      .select(col("doc_id"), col("n_chunks"), col("chunk_idx"),
        (col("chunk_idx") * 160L).as("chunk_start"),
        expr("substring(text, CAST(chunk_idx * 160 + 1 AS INT), 200)").as("chunk_text"))
      .withColumn("chunk_len", length(col("chunk_text")).cast("long"))

  private val c11Sql = """
    WITH d AS (
      SELECT doc_id, text,
        GREATEST((CAST(LENGTH(text) AS BIGINT) - 41) // 160 + 1, 1) AS n_chunks
      FROM documents WHERE LENGTH(text) > 0),
    e AS (SELECT doc_id, n_chunks, UNNEST(range(n_chunks)) AS chunk_idx, text FROM d)
    SELECT doc_id, n_chunks, CAST(chunk_idx AS BIGINT) AS chunk_idx,
      CAST(chunk_idx * 160 AS BIGINT) AS chunk_start,
      SUBSTRING(text, CAST(chunk_idx * 160 + 1 AS INT), 200) AS chunk_text,
      CAST(LENGTH(SUBSTRING(text, CAST(chunk_idx * 160 + 1 AS INT), 200)) AS BIGINT) AS chunk_len
    FROM e"""

  // -------------------------------------- c12 bloom-gated decontamination

  /** Cross-split leakage check with a Bloom prefilter: find training
    * documents (doc_id % 7 ≠ 0) whose 3-word prefix fingerprint also
    * appears in the held-out split (doc_id % 7 = 0). The exact
    * membership join is gated by `bloom_filter_agg`/`might_contain`
    * (Spark's native BloomFilterAggregate as a scalar subquery): the
    * 100 TB training side is scanned once, each row pays one xxhash64
    * probe against the broadcast bloom bitmap, and only bloom HITS
    * reach the verification join — the join's probe side shrinks from
    * the corpus to (true hits + fpp·corpus), which is what makes an
    * exact-verify join affordable when the eval fingerprint set is
    * too large to broadcast. Bloom filters have no false negatives
    * and the verify join removes false positives, so the result is
    * EXACT — the oracle is the plain EXISTS query. */
  def c12_bloom_decontaminate(s: SparkSession, dir: String): DataFrame = {
    docs(s, dir).createOrReplaceTempView("c12_docs")
    s.sql("""
      WITH f AS (
        SELECT doc_id, concat_ws(' ', slice(split(text, ' '), 1, 3)) AS fp
        FROM c12_docs WHERE length(text) > 0),
      ev AS (SELECT DISTINCT fp FROM f WHERE doc_id % 7 = 0),
      cand AS (
        SELECT doc_id, fp FROM f
        WHERE doc_id % 7 <> 0
          AND might_contain(
                (SELECT bloom_filter_agg(xxhash64(fp), 100000L, 800000L) FROM ev),
                xxhash64(fp)))
      SELECT doc_id, fp FROM cand WHERE EXISTS (SELECT 1 FROM ev WHERE ev.fp = cand.fp)""")
  }

  private val c12Sql = """
    WITH f AS (
      SELECT doc_id, array_to_string((string_split(text, ' '))[1:3], ' ') AS fp
      FROM documents WHERE LENGTH(text) > 0),
    ev AS (SELECT DISTINCT fp FROM f WHERE doc_id % 7 = 0)
    SELECT doc_id, fp FROM f d
    WHERE doc_id % 7 <> 0 AND EXISTS (SELECT 1 FROM ev WHERE ev.fp = d.fp)"""

  // -------------------------------------------- c13 deterministic shuffle

  /** Deterministic training-order shuffle: every document gets a
    * gap-free position in a pseudorandom global order — the "shuffle
    * the corpus once, stream it in position order every epoch" step.
    * The order key is a modular hash of the stable id (dual-dialect
    * exact int64, same reproducibility argument as c1/c10: unchanged
    * under repartitioning or cluster resize; at fleet scale swap in a
    * 64-bit mix — the 31-bit form here is what both engines evaluate
    * bit-identically). Positions use the c9 zero-skew technique —
    * hash-range buckets, within-bucket row_number, broadcast bucket
    * offsets — so there is NO single-reducer global sort: the only
    * wide exchange is the bucket hash partitioning, and bucket counts
    * are uniform by construction of the hash. */
  def c13_shuffle(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"),
        expr(s"(doc_id * 69069 + 12345) % $P").as("h"))
      // P/2^21 ≈ 1024 hash-range buckets; contiguous in (h) order so
      // bucket offsets linearize into one global order
      .withColumn("blk", expr(s"h div ${1 << 21}"))
    val wIn = Window.partitionBy("blk").orderBy("h", "doc_id")
    val rn = d.withColumn("rn", row_number().over(wIn).cast("long"))
    val wOff = Window.orderBy("blk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = d.groupBy("blk").agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(sum("cnt").over(wOff), lit(0L)))
      .select("blk", "off")
    rn.join(broadcast(offs), Seq("blk"))
      .select(col("doc_id"), (col("rn") + col("off")).as("pos"))
  }

  private val c13Sql = s"""
    SELECT doc_id,
      CAST(ROW_NUMBER() OVER (
        ORDER BY (doc_id * 69069 + 12345) % $P, doc_id) AS BIGINT) AS pos
    FROM documents"""

  // -------------------------------------------------------------- registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c1_split_hash" -> (c1_split_hash _),
    "c2_stratified_sample" -> (c2_stratified_sample _),
    "c3_vocab" -> (c3_vocab _),
    "c4_tfidf" -> (c4_tfidf _),
    "c5_editdist_pairs" -> (c5_editdist_pairs _),
    "c6_pivot" -> (c6_pivot _),
    "c7_pack_sequences" -> (c7_pack_sequences _),
    "c8_decontaminate" -> (c8_decontaminate _),
    "c9_global_ordinals" -> (c9_global_ordinals _),
    "c10_mixture" -> (c10_mixture _),
    "c11_chunk_docs" -> (c11_chunk_docs _),
    "c12_bloom_decontaminate" -> (c12_bloom_decontaminate _),
    "c13_shuffle" -> (c13_shuffle _),
    "cp1_pipeline" -> (cp1_pipeline _))

  val oracle: Map[String, String] = Map(
    "c1_split_hash" -> c1Sql,
    "c2_stratified_sample" -> c2Sql,
    "c3_vocab" -> c3Sql,
    "c4_tfidf" -> c4Sql,
    "c5_editdist_pairs" -> c5Sql,
    "c6_pivot" -> c6Sql,
    "c7_pack_sequences" -> c7Sql,
    "c8_decontaminate" -> c8Sql,
    "c9_global_ordinals" -> c9Sql,
    "c10_mixture" -> c10Sql,
    "c11_chunk_docs" -> c11Sql,
    "c12_bloom_decontaminate" -> c12Sql,
    "c13_shuffle" -> c13Sql,
    "cp1_pipeline" -> cp1Sql)
}
