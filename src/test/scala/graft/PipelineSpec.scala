package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline._

/** Value-level checks for the training-pipeline ops (sf0.001; the
  * DuckDB hash gate runs at sf0.01 via tools/compare.py). */
class PipelineSpec extends AnyFunSuite {
  import TestSession._

  test("exact dedup: keeper is min doc_id of its hash group") {
    val rows = Dedup.d1_dedup_exact(spark, sf)
      .select("doc_id", "keeper_id").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(1) <= r.getLong(0)))
  }

  test("ngram jaccard pairs are high-similarity and ordered") {
    val rows = Dedup.d2_dedup_ngram(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      assert(r.getAs[Double]("jaccard") >= 0.5)
    }
  }

  test("d6 reads d2's pairs from cache instead of re-running the pipeline") {
    Dedup.d2_dedup_ngram(spark, sf).count() // materialize the persisted pairs
    val d6 = Dedup.d6_dedup_apply(spark, sf)
    d6.count()
    val plan = d6.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage"),
      s"d6's plan should scan the cached pair table:\n$plan")
  }

  test("dedup apply drops exactly the jaccard losers") {
    val losers = Dedup.d2_dedup_ngram(spark, sf)
      .select("doc_b").distinct().collect().map(_.getLong(0)).toSet
    val survivors = Dedup.d6_dedup_apply(spark, sf)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val all = operators.Tables.load(spark, sf, "documents")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == all -- losers)
  }

  test("minhash est_jaccard within [0.75, 1]") {
    val est = Dedup.d3_dedup_minhash(spark, sf)
      .collect().map(_.getAs[Double]("est_jaccard"))
    assert(est.nonEmpty)
    assert(est.forall(e => e >= 0.75 && e <= 1.0))
  }

  test("simhash hamming bounded") {
    val h = Dedup.d4_dedup_simhash(spark, sf)
      .collect().map(_.getAs[Long]("hamming"))
    assert(h.nonEmpty && h.forall(_ <= 3))
  }

  test("bucketPairs tiled hot path ≡ plain bucket self-join") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // bucket 1 is hot at chunkSize=3 (10 docs -> 4 chunks), bucket 2
    // cold (3 docs), bucket 3 degenerate (1 doc, no pairs); payload v
    // must ride through the struct unchanged
    val banded = ((1 to 10).map(i => (1, i.toLong, s"v$i")) ++
      Seq((2, 100L, "x"), (2, 101L, "y"), (2, 102L, "z"), (3, 200L, "w")))
      .toDF("k", "doc_id", "v")
    val got = Dedup.bucketPairs(banded, Seq("k"), "doc_id", 3, "spec:hot")
      .select(col("a.doc_id"), col("b.doc_id"), col("a.v"), col("b.v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    val naive = banded.as("x").join(banded.as("y"),
        col("x.k") === col("y.k") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id"), col("x.v"), col("y.v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(got.length == 45 + 3) // C(10,2) + C(3,2)
    assert(got.sorted.toSeq == naive.sorted.toSeq)
    assert(got.forall { case (a, b, _, _) => a < b })
    // all-cold dispatch branch (no bucket over chunkSize): same pairs
    val cold = Dedup.bucketPairs(banded, Seq("k"), "doc_id", 64, "spec:cold")
      .select(col("a.doc_id"), col("b.doc_id"), col("a.v"), col("b.v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(cold.sorted.toSeq == naive.sorted.toSeq)
  }

  test("hot-probe memo invalidates when the corpus stamp changes") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 6 docs in one bucket: hot at chunkSize=3, cold at chunkSize=64
    val hotFrame = (1 to 6).map(i => (1, i.toLong)).toDF("k", "doc_id")
    val coldFrame = Seq((1, 1L), (1, 2L)).toDF("k", "doc_id")
    // first sight of this corpus: cold
    Dedup.bucketPairs(coldFrame, Seq("k"), "doc_id", 3, "spec:memo:stampA").count()
    assert(!Dedup.lastDispatchHot)
    // same probe key (same corpus stamp): the memo keeps the cold plan
    // even on a now-hot frame — this is the documented memo semantics
    Dedup.bucketPairs(hotFrame, Seq("k"), "doc_id", 3, "spec:memo:stampA").count()
    assert(!Dedup.lastDispatchHot)
    // the corpus grew: the dir-keyed callers fold corpusStamp into the
    // probe key, so the key CHANGES and the dispatch re-probes → hot,
    // within the same JVM
    Dedup.bucketPairs(hotFrame, Seq("k"), "doc_id", 3, "spec:memo:stampB").count()
    assert(Dedup.lastDispatchHot)
  }

  test("corpusStamp changes when the corpus file grows") {
    val dir = java.nio.file.Files.createTempDirectory("stampspec").toFile
    val f = new java.io.File(dir, "documents.parquet")
    java.nio.file.Files.write(f.toPath, Array.fill[Byte](64)(1))
    val s1 = Dedup.corpusStamp(spark, dir.getAbsolutePath, "documents")
    assert(s1 != "na")
    java.nio.file.Files.write(f.toPath, Array.fill[Byte](128)(2))
    val s2 = Dedup.corpusStamp(spark, dir.getAbsolutePath, "documents")
    assert(s1 != s2, s"stamp must change on growth: $s1 vs $s2")
  }

  test("d7 single-task union-find ≡ distributed propagation") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // chain 1-2-3-4 (transitive), star 10-{11,12}, singleton pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (10L, 12L), (20L, 21L))
    val edges = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val single = Dedup.componentsSingleTask(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val dist = Dedup.propagateComponents(spark, edges, 2,
        spark.conf.get("spark.sql.shuffle.partitions"),
        spark.conf.get("spark.sql.adaptive.enabled"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    edges.unpersist()
    assert(single == dist)
    assert(single == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("brute ANN returns topK ranked neighbors per probe") {
    val rows = Similarity.s1_ann_brute(spark, sf).collect()
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size == 5)
    byQuery.values.foreach { g =>
      assert(g.length == 10)
      val sorted = g.sortBy(_.getAs[Long]("rk"))
      val cos = sorted.map(_.getAs[Double]("cosine"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
  }

  test("IVF ANN: ranked output with reasonable recall vs brute force") {
    val brute = Similarity.s1_ann_brute(spark, sf).filter("rk <= 5").collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    val ivf = Similarity.s3_ann_ivf(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    assert(ivf.nonEmpty)
    val recalls = ivf.map { case (q, got) =>
      brute.get(q).map(want => got.intersect(want).size.toDouble / want.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    info(f"IVF recall@5 vs brute: $mean%.2f over ${recalls.size} probes")
    assert(mean >= 0.2) // nprobe=2 of ~6 lists; exactness is s1's job
  }

  test("PQ ANN: codes-only distances still recover true neighbors") {
    val brute = Similarity.s1_ann_brute(spark, sf).filter("rk <= 5").collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    val pq = Similarity.s6_ann_pq(spark, sf).collect()
    assert(pq.nonEmpty)
    // Exactly topK ranked rows per probe, distances non-negative.
    pq.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("rk")).sorted.toSeq == (1L to 10L))
      rows.foreach(r => assert(r.getAs[Long]("approx_dist") >= 0L))
    }
    val byQ = pq.groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    val recalls = byQ.map { case (q, got) =>
      brute.get(q).map(want => got.intersect(want).size.toDouble / want.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    info(f"PQ recall@5 vs brute: $mean%.2f over ${recalls.size} probes")
    // 8-entry codebooks over 16-dim subspaces: coarse, but codes alone
    // must still beat random (random recall@5 of 500 ≈ 0.01).
    assert(mean >= 0.2)
  }

  test("LSH ANN neighbors share the probe's bucket") {
    val rows = Similarity.s2_ann_lsh(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("rk") <= 3))
  }

  test("multimodal decode is deterministic and batch-shaped") {
    val a = Multimodal.m1_multimodal_decode(spark, sf).collect()
    val b = Multimodal.m1_multimodal_decode(spark, sf).collect()
    assert(a.length == b.length && a.length > 0)
    assert(a.map(_.toSeq).toSet == b.map(_.toSeq).toSet)
    a.foreach { r =>
      assert(r.getAs[Long]("width") >= 16 && r.getAs[Long]("width") < 80)
      assert(r.getAs[Double]("byte_entropy_q") >= 0.0)
    }
  }

  test("multimodal resize halves dimensions and pools the feature bins") {
    val features = Multimodal.m1_multimodal_decode(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val resized = Multimodal.m3_multimodal_resize(spark, sf).collect()
    assert(resized.length == features.size)
    resized.foreach { r =>
      val f = features(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("thumb_w") == f.getAs[Long]("width") / 2)
      assert(r.getAs[Long]("thumb_h") == f.getAs[Long]("height") / 2)
      assert(r.getAs[Double]("pool_0") >= 0.0 && r.getAs[Double]("pool_0") <= 1.0)
    }
  }

  test("decodeStub frame count matches payload length math") {
    val item = MediaItem(1L, "img", 10, Array.fill[Byte](600)(65))
    val f = Multimodal.decodeStub(item)
    assert(f.n_frames == 1 + (600 - 256) / 128)
    assert(math.abs(f.histogram.sum - 1.0) < 1e-9)
  }

  test("langid predicts en for this ascii corpus") {
    val rows = TextAnalysis.t3_text_langid(spark, sf).collect()
    val en = rows.count(_.getAs[String]("predicted_lang") == "en")
    assert(en.toDouble / rows.length > 0.9)
  }

  test("fingerprint: 4 hashes per doc, ascending") {
    val rows = TextAnalysis.t4_text_fingerprint(spark, sf).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    byDoc.values.foreach { g =>
      assert(g.length <= 4)
      val sorted = g.sortBy(_.getAs[Long]("rk")).map(_.getAs[Long]("h"))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b })
    }
  }
}
