package graft

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Randomized pruning-soundness property for the Zarr scan: for ANY
  * predicate, the planned (pruned) scan plus Spark's residual filter
  * must return exactly the rows of the unpruned table filtered
  * post-hoc. The connector's Inexact pushdown posture re-applies every
  * filter after the scan, so the only way a result can be wrong is
  * OVER-pruning — a chunk or partition wrongly skipped at plan time.
  * That bug class lives on edge values the fixed filter tests
  * hand-pick around: float coordinates carrying representation error
  * (i * 0.3 steps), epsilon-perturbed constants, midpoints,
  * out-of-domain constants (empty-range short-circuit), negated atoms,
  * and compound AND/OR trees mixing pushable coordinate atoms with
  * unpushable data-variable atoms. */
class ZarrFilterPropSpec extends AnyFunSuite {
  import TestSession._

  // 12 x 11 x 5 grid; t chunked 3 -> 4 outer slabs; lat carries float
  // representation error (i * 0.3), lon is a small long dim.
  private val latVals: Seq[Double] = (-5 to 5).map(i => i * 0.3)
  private lazy val store: String = {
    val rows = for {
      t <- 0 until 12
      lat <- latVals
      lon <- 0 until 5
    } yield org.apache.spark.sql.Row(
      t.toLong, lat, lon.toLong, t * 2.5 + lat * 10 + lon)
    val schema = StructType(Seq(
      StructField("t", LongType, nullable = false),
      StructField("lat", DoubleType, nullable = false),
      StructField("lon", LongType, nullable = false),
      StructField("v", DoubleType, nullable = true)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val out = Files.createTempDirectory("zarr_filter_prop").resolve("g.zarr").toString
    df.write.format("zarr")
      .option("coords", "t,lat,lon")
      .option("chunkOuter", "3")
      .mode("overwrite").save(out)
    out
  }
  private lazy val zarr: DataFrame =
    spark.read.format("zarr").option("minRowsPerPartition", "1").load(store)
  /** Ground truth: the full table materialized OUTSIDE the connector,
    * so the reference filter path shares no pruning code with the
    * path under test. */
  private lazy val local: DataFrame = {
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(zarr.collect().toSeq, 2), zarr.schema)
    d.cache(); d.count()
    d
  }

  // ---- predicate generator -------------------------------------------
  // Constants deliberately include exact domain values, epsilon
  // perturbations, midpoints between grid steps, and out-of-domain
  // values on both sides.
  private val tConsts = Seq(-3L, 0L, 1L, 3L, 7L, 11L, 12L, 99L)
  private val latConsts: Seq[Double] =
    latVals ++ latVals.map(_ + 1e-12) ++ latVals.map(_ - 1e-12) ++
      Seq(-9.9, 9.9, 0.45, -0.45, 0.8999999999999999, 0.9000000000000001)
  private val lonConsts = Seq(-1L, 0L, 2L, 4L, 5L)

  private def cmp(c: Column, v: Any, op: Int): Column = op match {
    case 0 => c === lit(v)
    case 1 => c =!= lit(v)
    case 2 => c < lit(v)
    case 3 => c <= lit(v)
    case 4 => c > lit(v)
    case _ => c >= lit(v)
  }

  private val genAtom: Gen[Column] = Gen.frequency(
    4 -> (for { v <- Gen.oneOf(tConsts); op <- Gen.choose(0, 5) } yield cmp(col("t"), v, op)),
    4 -> (for { v <- Gen.oneOf(latConsts); op <- Gen.choose(0, 5) } yield cmp(col("lat"), v, op)),
    3 -> (for { v <- Gen.oneOf(lonConsts); op <- Gen.choose(0, 5) } yield cmp(col("lon"), v, op)),
    2 -> (for { a <- Gen.oneOf(tConsts); b <- Gen.oneOf(tConsts) } yield
      col("t").between(lit(math.min(a, b)), lit(math.max(a, b)))),
    2 -> (for { vs <- Gen.pick(2, latConsts) } yield col("lat").isin(vs.toSeq.map(lit(_)): _*)),
    2 -> (for { vs <- Gen.pick(2, tConsts) } yield col("t").isin(vs.toSeq.map(lit(_)): _*)),
    1 -> (for { v <- Gen.choose(-20.0, 50.0) } yield col("v") > lit(v)), // unpushable residual
    1 -> Gen.oneOf(tConsts).map(v => !(col("t") === lit(v))))

  private val genPred: Gen[Column] = for {
    n <- Gen.choose(1, 3)
    atoms <- Gen.listOfN(n, genAtom)
    ops <- Gen.listOfN(n - 1, Gen.oneOf(true, false))
  } yield atoms.tail.zip(ops).foldLeft(atoms.head) {
    case (acc, (a, true)) => acc && a
    case (acc, (a, false)) => acc || a
  }

  test("pruned scan + residual filter == unpruned table filtered post-hoc") {
    var empty = 0
    var nonEmpty = 0
    val prop = Prop.forAll(genPred) { pred =>
      val got = zarr.filter(pred).collect().map(_.toSeq).sortBy(_.mkString("|"))
      val want = local.filter(pred).collect().map(_.toSeq).sortBy(_.mkString("|"))
      if (want.isEmpty) empty += 1 else nonEmpty += 1
      Prop(got.toSeq == want.toSeq) :|
        s"pred=${pred.toString} got=${got.length} want=${want.length}"
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(120), prop)
    assert(res.passed, res.status.toString)
    // The sweep must exercise both the empty-range short-circuit and
    // real row returns, or the property is vacuous.
    assert(empty > 5, s"only $empty empty-result predicates — domain too narrow")
    assert(nonEmpty > 20, s"only $nonEmpty non-empty predicates — domain too wide")
  }

  test("coordinate equality plans fewer partitions than the full scan") {
    val all = zarr.rdd.getNumPartitions
    val pruned = zarr.filter(col("t") === 3L).rdd.getNumPartitions
    assert(pruned < all, s"equality did not prune: $pruned vs $all")
    // provably-empty coordinate filter plans zero partitions
    val none = zarr.filter(col("t") === 99L).rdd.getNumPartitions
    assert(none == 0, s"out-of-domain equality planned $none partitions")
  }
}
