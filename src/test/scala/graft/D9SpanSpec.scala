package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Dedup

/** d9 exact repeated-span detection: a scripted corpus with known
  * shared passages pins the exact spans; the sf0.001 corpus pins the
  * structural invariants (spans disjoint and W-or-longer, every
  * window inside a span duplicated cross-doc, maximality at both
  * ends). Value equality vs the DuckDB oracle is the driver's gate. */
object D9SpanSpec {
  /** A corpus where the duplicated spans are known by construction:
    * docs 1 and 2 share a 12-token passage (one maximal span each,
    * at different offsets), doc 3 shares nothing long enough, and
    * doc 4 repeats doc 1's passage so the span appears in 3 docs.
    * Shared with D10SpanApplySpec (same corpus, apply side). */
  @volatile private var cached: String = _
  def scriptedDir(spark: org.apache.spark.sql.SparkSession): String = synchronized {
    if (cached != null) return cached
    val dir = Files.createTempDirectory("d9spec").toFile
    dir.deleteOnExit()
    val shared = (1 to 12).map(i => s"common$i").mkString(" ")
    val rows = Seq(
      (1L, s"alpha beta $shared gamma delta epsilon zeta eta theta", "en", "a", 0L),
      (2L, s"one two three four five six seven $shared tail", "en", "a", 0L),
      (3L, "lone words that appear nowhere else in any other document here", "en", "a", 0L),
      (4L, s"$shared completely different suffix tokens follow here now", "en", "a", 0L),
      // shorter than any window (W=8): must yield no windows at all —
      // exercises the size(t) >= W guard (an unguarded sequence(1, n-7)
      // would DESCEND for n < 8 and explode phantom positions) — and
      // must pass through the d10 rebuild byte-identical
      (5L, "tiny three tokens", "en", "a", 0L))
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${dir.getAbsolutePath}/documents.parquet")
    cached = dir.getAbsolutePath
    cached
  }
}

class D9SpanSpec extends AnyFunSuite {
  import TestSession._

  private val W = Dedup.d9WindowTokens

  private lazy val scriptedDir: String = D9SpanSpec.scriptedDir(spark)

  test("scripted corpus: exactly the constructed spans, token-exact") {
    val got = Dedup.d9_dedup_spans(spark, scriptedDir)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // shared passage = 12 tokens → 12-W+1 = 5 windows → one maximal
    // span of exactly 12 tokens per doc, at each doc's own offset
    // (doc 1: tokens 3..14; doc 2: 8..19; doc 4: 1..12).
    assert(got.toSeq === Seq(
      (1L, 3L, 14L, 12L),
      (2L, 8L, 19L, 12L),
      (4L, 1L, 12L, 12L)))
  }

  private lazy val out: DataFrame = Dedup.d9_dedup_spans(spark, sf).cache()

  test("sf0.001: spans exist, are >= W tokens, and arithmetic is consistent") {
    assert(out.count() > 0)
    val bad = out.filter(
      col("span_toks") =!= (col("span_end") - col("span_start") + 1) ||
        col("span_toks") < W || col("span_start") < 1)
    assert(bad.isEmpty, "span arithmetic violated")
  }

  test("sf0.001: window-position ranges within a doc are disjoint (maximal merge)") {
    // The ALGORITHM invariant is disjointness of WINDOW-POSITION ranges
    // [span_start, span_end - (W-1)]: islands merge only CONSECUTIVE
    // duplicated window positions, so two duplicated windows at p and
    // p+g with 2 <= g <= W-1 (the gap window unshared) legitimately
    // yield two spans whose TOKEN ranges overlap — token-range
    // disjointness would be a corpus-dependent accident, not a property
    // (round 11 ADVICE; the previous assertion tested exactly that
    // accident).
    val overlapping = out.as("a").join(out.as("b"),
        col("a.doc_id") === col("b.doc_id") &&
          col("a.span_start") < col("b.span_start") &&
          (col("a.span_end") - (W - 1)) >= col("b.span_start"))
    assert(overlapping.isEmpty, "adjacent duplicated windows were not merged")
  }

  /** Independent per-position duplication oracle: every W-token window
    * string and the set of docs it appears in, recomputed with a
    * different plan (groupBy window string directly — exactness is
    * free at spec scale). */
  private lazy val dupByPos: DataFrame = {
    val wins = graft.operators.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .where(size(col("t")) >= W)
      .select(col("doc_id"), expr(
        s"explode(transform(sequence(1, size(t) - ${W - 1}), " +
          s"i -> struct(i AS pos, array_join(slice(t, i, $W), ' ') AS win)))").as("w"))
      .select(col("doc_id"), col("w.pos").as("pos"), col("w.win").as("win"))
    val dup = wins.groupBy("win")
      .agg(countDistinct(col("doc_id")).as("nd")).where(col("nd") >= 2)
    wins.join(dup, Seq("win")).select("doc_id", "pos").cache()
  }

  test("sf0.001: every window position inside a span is duplicated cross-doc") {
    val covered = out.select(col("doc_id"), col("span_start"),
        (col("span_end") - (W - 1)).as("last_w"))
      .select(col("doc_id"),
        explode(expr("sequence(span_start, last_w)")).as("pos"))
    assert(covered.join(dupByPos, Seq("doc_id", "pos"), "left_anti").isEmpty,
      "a span covers a window that is not duplicated")
  }

  test("sf0.001: spans are maximal — the positions just outside are not duplicated") {
    val before = out.select(col("doc_id"), (col("span_start") - 1).as("pos"))
      .where(col("pos") >= 1)
    val after = out.select(col("doc_id"),
      (col("span_end") - (W - 1) + 1).as("pos"))
    assert(before.union(after).join(dupByPos, Seq("doc_id", "pos")).isEmpty,
      "a duplicated window borders a span — the span was not maximal")
  }
}
