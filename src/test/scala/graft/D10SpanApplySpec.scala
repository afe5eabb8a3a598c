package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Dedup

/** d10 span apply: the scripted D9 corpus pins the exact cleaned
  * texts (keeper keeps, non-keepers lose exactly the span); the
  * sf0.001 corpus pins the conservation invariants. Value equality vs
  * the DuckDB oracle is the driver's gate. */
class D10SpanApplySpec extends AnyFunSuite {
  import TestSession._

  test("scripted corpus: keeper untouched, non-keepers lose exactly the span") {
    val shared = (1 to 12).map(i => s"common$i").mkString(" ")
    val got = Dedup.d10_span_apply(spark, D9SpanSpec.scriptedDir(spark))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      // doc 1 is the minimum doc containing the span's head window → keeper
      (1L, s"alpha beta $shared gamma delta epsilon zeta eta theta", 0L),
      (2L, "one two three four five six seven tail", 12L),
      (3L, "lone words that appear nowhere else in any other document here", 0L),
      (4L, "completely different suffix tokens follow here now", 12L),
      // shorter than W: no windows, byte-identical pass-through
      (5L, "tiny three tokens", 0L)))
  }

  private lazy val out: DataFrame = Dedup.d10_span_apply(spark, sf).cache()
  private lazy val spans: DataFrame = Dedup.d9_dedup_spans(spark, sf).cache()
  private lazy val original: DataFrame =
    graft.operators.Tables.load(spark, sf, "documents")

  test("sf0.001: every doc present once; token conservation holds") {
    assert(out.count() === original.count())
    val joined = out.join(original, Seq("doc_id"))
      .select(col("doc_id"), col("n_removed"),
        size(split(col("text"), " ")).cast("long").as("orig_toks"),
        when(col("clean_text") === "", lit(0L))
          .otherwise(size(split(col("clean_text"), " ")).cast("long")).as("clean_toks"))
    val bad = joined.filter(col("clean_toks") + col("n_removed") =!= col("orig_toks"))
    assert(bad.isEmpty, "clean_toks + n_removed != original token count")
  }

  test("sf0.001: docs with no spans pass through byte-identical") {
    val spanned = spans.select("doc_id").distinct()
    val untouched = out.join(spanned, Seq("doc_id"), "left_anti")
      .join(original, Seq("doc_id"))
    assert(untouched.filter(col("clean_text") =!= col("text") ||
      col("n_removed") =!= 0).isEmpty)
    // and something was actually removed somewhere
    assert(out.agg(sum("n_removed")).head.getLong(0) > 0)
  }

  test("sf0.001: removal only ever happens on spanned docs, bounded by their span lengths") {
    val perDoc = spans.groupBy("doc_id")
      .agg(sum(col("span_toks")).as("span_toks"))
    val j = out.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_removed"),
        coalesce(col("span_toks"), lit(0L)).as("span_toks"))
    assert(j.filter(col("n_removed") > col("span_toks")).isEmpty,
      "removed more tokens than the doc's spans cover")
    assert(j.filter(col("n_removed") > 0 && col("span_toks") === 0).isEmpty,
      "removed tokens from a doc with no spans")
  }

  test("sf0.001: every duplicated span survives in at least one doc (the keeper)") {
    // for each distinct span head position removed somewhere, SOME doc
    // retains those tokens: total removals < total span occurrences
    val removedDocs = out.filter(col("n_removed") > 0).count()
    val spannedDocs = spans.select("doc_id").distinct().count()
    assert(removedDocs < spannedDocs || spannedDocs == 0,
      s"every spanned doc lost its span ($removedDocs of $spannedDocs) — no keeper survived")
  }
}
