package graft

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Randomized correctness property for multi-store union reads and the
  * executor-side grouped/ungrouped metadata-aggregate merge (rewritten
  * round 7 to partial pushdown): for ANY member layout — overlapping
  * or disjoint outer extents, different inner-dimension lengths,
  * different chunk sizes — and ANY supported aggregate shape, the
  * union read must equal the member rows materialized OUTSIDE the
  * connector. Data values are integral-valued doubles so sums are
  * order-independent and exact, making the comparison bit-strict even
  * where the metadata path folds in a different order than Spark's
  * row aggregation. */
class ZarrUnionPropSpec extends AnyFunSuite {
  import TestSession._

  private def grid(ts: Seq[Long], nx: Int): DataFrame = {
    import spark.implicits._
    ts.flatMap(t => (0L until nx.toLong).map(x => (t, x, (t * 7 + x * 3).toDouble)))
      .toDF("t", "x", "v")
  }

  private def store(ts: Seq[Long], nx: Int, chunkOuter: Int): String = {
    val out = Files.createTempDirectory("zarr_union_prop").resolve("u.zarr").toString
    grid(ts, nx).write.format("zarr")
      .option("coords", "t,x").option("chunkOuter", chunkOuter.toString)
      .mode("overwrite").save(out)
    out
  }

  /** One member: a sorted distinct outer extent (drawn from a small
    * shared pool so members overlap often), an inner length, a chunk
    * size. */
  private val genMember: Gen[(Seq[Long], Int, Int)] = for {
    ts <- Gen.someOf(0L to 9L).suchThat(_.nonEmpty)
    nx <- Gen.choose(2, 4)
    chunk <- Gen.choose(1, 3)
  } yield (ts.toSeq.sorted, nx, chunk)

  private val genCase: Gen[(List[(Seq[Long], Int, Int)], Int, Boolean)] = for {
    nMembers <- Gen.choose(1, 4)
    members <- Gen.listOfN(nMembers, genMember)
    aggShape <- Gen.choose(0, 6)
    filtered <- Gen.oneOf(true, false)
  } yield (members, aggShape, filtered)

  private def aggOf(shape: Int, df: DataFrame, grouped: Boolean): DataFrame = {
    val base = if (grouped) df.groupBy("t") else df.groupBy()
    shape match {
      case 0 => base.agg(count(lit(1)).as("c"))
      case 1 => base.agg(count(col("v")).as("c"))
      case 2 => base.agg(min(col("x")).as("m"))
      case 3 => base.agg(max(col("x")).as("m"))
      case 4 => base.agg(sum(col("v")).as("s"))
      case 5 => base.agg(avg(col("v")).as("a"))
      case _ => base.agg(count(lit(1)).as("c"), min(col("x")).as("mn"),
        max(col("x")).as("mx"), sum(col("v")).as("s"))
    }
  }

  test("union reads and aggregate merges equal connector-free ground truth") {
    val prop = Prop.forAll(genCase) { case (members, aggShape, filtered) =>
      val paths = members.map { case (ts, nx, ch) => store(ts, nx, ch) }
      val union = spark.read.format("zarr").load(paths: _*)
      // ground truth: every member's logical rows built WITHOUT the
      // connector (same generator that fed the writer)
      val truth = members.map { case (ts, nx, _) => grid(ts, nx) }
        .reduce(_.unionAll(_))
      val (u, g) =
        if (filtered) (union.filter(col("t") >= 3L), truth.filter(col("t") >= 3L))
        else (union, truth)
      def canon(df: DataFrame): Seq[Seq[Any]] =
        df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
      val rowsOk = canon(u.orderBy("t", "x")) == canon(g.orderBy("t", "x"))
      val gAggOk = canon(aggOf(aggShape, u, grouped = true)) ==
        canon(aggOf(aggShape, g, grouped = true))
      val uAggOk = canon(aggOf(aggShape, u, grouped = false)) ==
        canon(aggOf(aggShape, g, grouped = false))
      Prop(rowsOk && gAggOk && uAggOk) :|
        s"members=${members.map { case (ts, nx, ch) => s"(${ts.mkString("/")},x$nx,c$ch)" }} " +
        s"agg=$aggShape filtered=$filtered rows=$rowsOk gAgg=$gAggOk uAgg=$uAggOk"
    }
    // each case writes up to 4 stores and runs ~6 jobs; 20 cases sweep
    // the overlap/extent/chunk space while keeping the suite fast
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }
}
