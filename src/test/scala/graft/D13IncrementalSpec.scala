package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Dedup

/** d13 incremental corpus-index dedup: a scripted corpus pins the
  * ingest contract — every near-dup pair TOUCHING the batch is
  * reported (corpus×batch and batch×batch), corpus-internal dups are
  * NOT (they were settled when the index was built) — the persisted
  * index survives an update (a second ingest sees the first batch's
  * docs), and the plan check pins the scale contract: the index side
  * is a parquet scan that never re-shuffles below the broadcast cut.
  * Value equality vs the DuckDB oracle at corpus scale is the
  * driver's gate. */
class D13IncrementalSpec extends AnyFunSuite {
  import TestSession._

  private val passage = (1 to 30).map(i => s"tok$i word$i").mkString(" ")
  private def unique(tag: String) =
    (1 to 40).map(i => s"$tag$i").mkString(" ")

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val d = Files.createTempDirectory("d13spec").toFile
    d.deleteOnExit()
    import spark.implicits._
    rows.map { case (id, t) => (id, t, "en", "a", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${d.getAbsolutePath}/documents.parquet")
    d.getAbsolutePath
  }

  // batch = pmod(doc_id, 7) = 0 → ids 0, 7, 14; corpus = the rest.
  // Docs 3 (corpus), 7 and 14 (batch) share a passage; corpus docs 4
  // and 5 are dups of EACH OTHER — an index-internal pair d13 must
  // NOT re-report.
  private lazy val dir: String = writeDocs(Seq(
    0L -> unique("zeta"),
    1L -> unique("alpha"),
    3L -> passage,
    4L -> unique("gamma"),
    5L -> unique("gamma"),
    7L -> passage,
    14L -> passage))

  test("pairs touching the batch reported; corpus-internal dups excluded") {
    val got = Dedup.d13_dedup_incremental(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sorted
    assert(got === Seq((3L, 7L, 1.0), (3L, 14L, 1.0), (7L, 14L, 1.0)))
  }

  test("index update: a later ingest sees the first batch's documents") {
    val idx = Dedup.d13IndexPath(spark, dir,
      "((doc_id % 7) + 7) % 7 <> 0")
    val before = spark.read.parquet(idx).count()
    Dedup.d13UpdateIndex(spark, idx,
      Dedup.minhashBands(spark, dir, "((doc_id % 7) + 7) % 7 = 0"))
    assert(spark.read.parquet(idx).count() ==
      before + Dedup.minhashBands(spark, dir,
        "((doc_id % 7) + 7) % 7 = 0").count())
    // next day's crawl: doc 21 duplicates the passage — against the
    // UPDATED index it must collide with corpus doc 3 AND the
    // admitted batch docs 7/14
    val dir2 = writeDocs(Seq(21L -> passage))
    val nextBands = Dedup.minhashBands(spark, dir2, "")
    val bandCols = Seq("band", "h1", "h2", "h3", "h4")
    val hits = spark.read.parquet(idx).as("a")
      .join(nextBands.as("b"),
        bandCols.map(c => col(s"a.$c") === col(s"b.$c")).reduce(_ && _))
      .select(col("a.doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(Set(3L, 7L, 14L).subsetOf(hits),
      s"updated index must surface 3, 7, 14; got $hits")
  }

  test("ingest against an UPDATED index emits no self-pairs and no duplicate pairs") {
    // the production flow the r15 a≠b guard protects: once
    // d13UpdateIndex has admitted a batch's bands, a batch doc joins
    // its own index copy — the guard plus the terminal distinct must
    // suppress (d, d, 1.0) self-pairs and mirrored index-copy×batch
    // duplicates. (The earlier test already appended once; append
    // again — extra copies only add more chances to emit bad rows.)
    val idx = Dedup.d13IndexPath(spark, dir, "((doc_id % 7) + 7) % 7 <> 0")
    Dedup.d13UpdateIndex(spark, idx,
      Dedup.minhashBands(spark, dir, "((doc_id % 7) + 7) % 7 = 0"))
    val got = Dedup.d13_dedup_incremental(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.forall { case (a, b, _) => a != b }, s"self-pairs in $got")
    assert(got.map(p => (p._1, p._2)).distinct.size == got.size,
      s"duplicate pairs in $got")
    assert(got.toSet == Set((3L, 7L, 1.0), (3L, 14L, 1.0), (7L, 14L, 1.0)))
  }

  test("dispatch: batch broadcasts under the cut, shuffles above it; rows identical") {
    def ops(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: ops(a.executedPlan)
      case q: QueryStageExec => q +: ops(q.plan)
      case o => o +: (o.children ++ o.subqueries).flatMap(ops)
    }
    val sfDir = "/root/testdata/sf0.001"
    val bc = Dedup.incrementalDedup(spark, sfDir, "0.75", 7)
    val bcRows = bc.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sorted
    assert(Dedup.lastIncrementalDispatch == "bcast")
    assert(ops(bc.queryExecution.executedPlan).exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "below the cut the batch bands must broadcast — the index side " +
        "is the 100 TB side and must not shuffle")
    val sh = Dedup.incrementalDedup(spark, sfDir, "0.75", 7, bcastMax = 0L)
    val shRows = sh.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sorted
    assert(Dedup.lastIncrementalDispatch == "shuffle")
    assert(ops(sh.queryExecution.executedPlan).exists(_.isInstanceOf[ShuffledHashJoinExec]),
      "above the cut the index⋈batch join must be a shuffled hash join")
    assert(bcRows == shRows, "dispatch moves the join strategy, never the result")
  }
}
