package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline._
import graft.operators.{Relational, Tables}

/** Value-level checks for the dataset-curation ops (sf0.001; the
  * DuckDB hash gate runs at sf0.01 via tools/compare.py). */
class CurationSpec extends AnyFunSuite {
  import TestSession._

  test("hash split covers every doc exactly once with ~80/10/10 buckets") {
    val rows = Curation.c1_split_hash(spark, sf).collect()
    val nDocs = Tables.load(spark, sf, "documents").count()
    assert(rows.length == nDocs)
    val bySplit = rows.groupBy(_.getAs[String]("split")).view.mapValues(_.length).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    // Multiplicative hash mod 100: train share must dominate.
    assert(bySplit("train") > bySplit("val") + bySplit("test"))
    // Assignment is a pure function of doc_id: re-running is identical.
    val again = Curation.c1_split_hash(spark, sf).collect()
    assert(rows.map(r => (r.getLong(0), r.getString(2))).sortBy(_._1).toSeq ==
      again.map(r => (r.getLong(0), r.getString(2))).sortBy(_._1).toSeq)
  }

  test("stratified sample takes at most the quota per language") {
    val rows = Curation.c2_stratified_sample(spark, sf).collect()
    val perLang = rows.groupBy(_.getAs[String]("lang")).view.mapValues(_.length)
    assert(perLang.values.forall(_ <= 20))
    assert(rows.forall(_.getAs[Long]("rn") <= 20))
  }

  test("vocab rows are (token, tf, df) with tf >= df and ordered by tf desc") {
    val rows = Curation.c3_vocab(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    rows.foreach { r =>
      assert(r.getAs[Long]("tf") >= r.getAs[Long]("df"))
      assert(r.getAs[Long]("df") >= 1L)
    }
    val tfs = rows.map(_.getAs[Long]("tf")).toSeq
    assert(tfs == tfs.sortBy(-_))
  }

  test("tfidf keeps top-3 terms per doc, score consistent with tf/df") {
    val rows = Curation.c4_tfidf(spark, sf).collect()
    val nDocs = Tables.load(spark, sf, "documents").count()
    val perDoc = rows.groupBy(_.getAs[Long]("doc_id")).view.mapValues(_.length)
    assert(perDoc.values.forall(_ <= 3))
    rows.foreach { r =>
      val expected = r.getAs[Long]("tf") * 1000000L * nDocs / r.getAs[Long]("df")
      assert(r.getAs[Long]("score") == expected)
    }
  }

  test("c8: a shared gram repeated inside one training doc counts once") {
    // pins exactly the r15 rewrite's changed aggregation semantics:
    // dedup AFTER the broadcast join means the per-doc COUNT(DISTINCT g)
    // over matches must collapse repeated occurrences of the same
    // eval-shared 5-gram. doc 0 (0 % 37 = 0) is the eval side; doc 1
    // contains its gram TWICE and a second shared gram once.
    import org.apache.spark.sql.functions.col
    val d = java.nio.file.Files.createTempDirectory("c8spec").toFile
    d.deleteOnExit()
    import TestSession.spark.implicits._
    Seq(
      (0L, "a b c d e f", "en", "a", 0L), // eval grams: "a b c d e", "b c d e f"
      (1L, "a b c d e x a b c d e", "en", "a", 0L), // shared gram twice
      (2L, "q r s t u v w", "en", "a", 0L)) // no shared grams
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${d.getAbsolutePath}/documents.parquet")
    val got = graft.pipeline.Curation.c8_decontaminate(
        TestSession.spark, d.getAbsolutePath)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L),
      s"doc 1 shares exactly one DISTINCT gram with the eval set; got $got")
  }

  test("editdist pairs are ordered, blocked, and within threshold") {
    val rows = Curation.c5_editdist_pairs(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("a_id") < r.getAs[Long]("b_id"))
      assert(r.getAs[Long]("lev") <= 10L)
    }
  }

  test("pivot counts sum to the corpus size") {
    val rows = Curation.c6_pivot(spark, sf).collect()
    val total = rows.map(r =>
      Seq("de", "en", "es", "fr", "zh").map(l => r.getAs[Long](l)).sum).sum
    assert(total == Tables.load(spark, sf, "documents").count())
  }

  test("split output written partitionBy(split) prunes partitions on read") {
    val out = java.nio.file.Files.createTempDirectory("graft_split").toString + "/docs"
    val split = Curation.c1_split_hash(spark, sf)
    split.write.partitionBy("split").mode("overwrite").parquet(out)
    // hive-layout directories per split value
    assert(new java.io.File(s"$out/split=train").isDirectory)
    val back = TestSession.spark.read.parquet(out)
      .filter(org.apache.spark.sql.functions.col("split") === "train")
    // the filter must become a partition filter (no data-file scan of val/test)
    val scans = back.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    assert(scans.head.partitionFilters.exists(_.toString.contains("split")),
      scans.head.partitionFilters.mkString(","))
    val expected = split.filter(org.apache.spark.sql.functions.col("split") === "train").count()
    assert(back.count() == expected)
  }

  test("sequence packing: offsets stay under budget and cumsum is consistent") {
    val rows = Curation.c7_pack_sequences(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("doc_id"))
      var cum = 0L
      sorted.foreach { r =>
        assert(r.getAs[Long]("pack_id") == cum / 2048)
        assert(r.getAs[Long]("pack_offset") == cum % 2048)
        cum += r.getAs[Long]("toks")
      }
    }
  }

  test("asof join: last view precedes purchase and gap is consistent") {
    val rows = Relational.q26_asof_join(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ts = r.getAs[Long]("ts_us"); val lv = r.getAs[Long]("last_view_us")
      assert(lv <= ts)
      assert(r.getAs[Long]("gap_us") == ts - lv)
    }
  }

  test("doc chunking: chunks tile the text with 40-char overlap, plan is shuffle-free") {
    val df = Curation.c11_chunk_docs(spark, sf)
    // One codegen span, zero exchanges: the op must stay embarrassingly parallel.
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"))
    val rows = df.collect()
    val texts = Tables.load(spark, sf, "documents").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (id, chunks) =>
      val text = texts(id)
      assert(chunks.length == chunks.head.getAs[Long]("n_chunks"))
      chunks.foreach { c =>
        val start = c.getAs[Long]("chunk_start").toInt
        assert(c.getAs[String]("chunk_text") ==
          text.substring(start, math.min(start + 200, text.length)))
      }
      // Coverage: the last chunk reaches the end of the document.
      val lastEnd = chunks.map(c =>
        c.getAs[Long]("chunk_start") + c.getAs[Long]("chunk_len")).max
      assert(lastEnd == text.length)
      // Overlap: consecutive starts are exactly one stride apart.
      val starts = chunks.map(_.getAs[Long]("chunk_start")).sorted
      starts.sliding(2).filter(_.length == 2).foreach(w => assert(w(1) - w(0) == 160L))
    }
  }

  test("bloom decontamination: exact result, bloom gate present in the plan") {
    val df = Curation.c12_bloom_decontaminate(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // The bloom aggregate and the probe must survive into the physical
    // plan — the scan-side prefilter is the point of the op.
    assert(plan.contains("bloom_filter_agg") || plan.contains("BloomFilter"))
    assert(plan.contains("might_contain"))
    val got = df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // Brute-force reference: exact fingerprint membership, no bloom.
    import org.apache.spark.sql.functions._
    val f = Tables.load(spark, sf, "documents")
      .filter(length(col("text")) > 0)
      .select(col("doc_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 3)).as("fp"))
    val ev = f.filter(col("doc_id") % 7 === 0).select("fp").distinct()
    val want = f.filter(col("doc_id") % 7 =!= 0)
      .join(ev, "fp").select("doc_id", "fp")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("range frame counts only events in the preceding minute") {
    val rows = Relational.q27_range_frame(spark, sf).collect()
    assert(rows.nonEmpty)
    // Spot-check one user against a driver-side recount.
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    val (_, urows) = byUser.maxBy(_._2.length)
    val ts = urows.map(_.getAs[Long]("ts_us")).sorted
    urows.foreach { r =>
      val t = r.getAs[Long]("ts_us")
      val expected = ts.count(x => x >= t - 60000000L && x <= t - 1L)
      assert(r.getAs[Long]("n_prev_min") == expected)
    }
  }
}
