package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Chunk-level SUM/AVG aggregate pushdown — the reference's roadmap
  * "Aggregate pushdown (push SUM/AVG/COUNT to chunk level)"
  * (/root/reference/README.md:298). The sink records per-chunk
  * (sum, written-count) partials in the `.zstats` sidecar with a
  * complete-coverage attestation; the scan then answers ungrouped
  * SUM/AVG over data variables with zero chunk IO. Coordinate sums
  * are grid arithmetic over the eagerly-loaded coordinate values.
  */
class ZarrSumAggSpec extends AnyFunSuite {
  import TestSession._

  private val fixture = "src/test/resources/zarr/synthetic_v3.zarr"

  private def scanDesc(df: DataFrame): String = {
    df.count()
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }.getOrElse("")
  }

  /** A 4×5 int grid with known values written through the sink. */
  private def writeIntStore(path: String, partial: Boolean = false): Unit = {
    import spark.implicits._
    val all = for { a <- 0 until 4; b <- 0 until 5 } yield (a.toLong, b.toLong,
      (a * 100 + b * 7 - 30).toLong)
    val rows = if (partial) all.filter { case (a, b, _) => (a + b) % 3 != 0 } else all
    rows.toDF("a", "b", "v").write.format("zarr")
      .option("coords", "a,b").option("chunkOuter", "2")
      .mode("overwrite").save(path)
  }

  test("SUM/AVG over an int data variable answer from the sidecar, zero chunk IO") {
    val out = Files.createTempDirectory("zarr_sum").resolve("s.zarr").toString
    writeIntStore(out)
    val z = spark.read.format("zarr").load(out)
    val df = z.agg(sum("v").as("s"), avg("v").as("m"), count(lit(1)).as("n"))
    val d = scanDesc(df)
    assert(d.contains("ZarrAggScan") && d.contains("metadata-only"), d)
    // differential: a data-var filter predicate blocks the pushdown
    val real = z.filter(col("v") > Long.MinValue)
      .agg(sum("v").as("s"), avg("v").as("m"), count(lit(1)).as("n"))
    assert(!scanDesc(real).contains("AggScan"), scanDesc(real))
    assert(df.collect().head.toSeq == real.collect().head.toSeq)
  }

  test("partial grid: unwritten cells count as fill (0) in the pushed total") {
    val out = Files.createTempDirectory("zarr_sum_p").resolve("p.zarr").toString
    writeIntStore(out, partial = true)
    val z = spark.read.format("zarr").load(out)
    val pushed = z.agg(sum("v"), avg("v"))
    assert(scanDesc(pushed).contains("ZarrAggScan"), scanDesc(pushed))
    val real = z.filter(col("v") > Long.MinValue).agg(sum("v"), avg("v"))
    assert(pushed.collect().head.toSeq == real.collect().head.toSeq)
  }

  test("float variable: double partials combine to the same binary-exact total") {
    import spark.implicits._
    val out = Files.createTempDirectory("zarr_sum_f").resolve("f.zarr").toString
    // halves are binary-exact: any summation order gives the same double
    val rows = for { a <- 0 until 6; b <- 0 until 4 } yield
      (a.toLong, b.toLong, (a * 2 + b).toDouble / 2.0)
    rows.toDF("a", "b", "x").write.format("zarr")
      .option("coords", "a,b").option("chunkOuter", "2")
      .mode("overwrite").save(out)
    val z = spark.read.format("zarr").load(out)
    val pushed = z.agg(sum("x"), avg("x"))
    assert(scanDesc(pushed).contains("ZarrAggScan"), scanDesc(pushed))
    val real = z.filter(col("x") > Double.MinValue).agg(sum("x"), avg("x"))
    assert(pushed.collect().head.toSeq == real.collect().head.toSeq)
  }

  test("coordinate SUM answers from metadata even without a sidecar") {
    val z = spark.read.format("zarr").load(fixture)
    val df = z.agg(sum("time").as("s"), avg("time").as("m"))
    assert(scanDesc(df).contains("ZarrAggScan"), scanDesc(df))
    val r = df.collect().head
    assert(r.getLong(0) == 21L * 100) // Σ(0..6) × 10 lat × 10 lon
    assert(r.getDouble(1) == 3.0)
  }

  test("guards: no attestation, filters, grouping, or datetime take the real scan") {
    // the committed fixture has no .zstats — data-var SUM must scan
    val z = spark.read.format("zarr").load(fixture)
    val noSidecar = z.agg(sum("temperature"))
    assert(!scanDesc(noSidecar).contains("AggScan"), scanDesc(noSidecar))

    val out = Files.createTempDirectory("zarr_sum_g").resolve("g.zarr").toString
    writeIntStore(out)
    val zs = spark.read.format("zarr").load(out)
    // a coordinate filter blocks the pushdown (guards in
    // supportCompletePushDown)
    assert(!scanDesc(zs.filter(col("a") === 1).agg(sum("v"))).contains("AggScan"))
    // grouped SUM with chunk extent 2 along the grouped dim is not
    // metadata-answerable (a chunk spans two groups) — real scan,
    // still correct
    assert(!scanDesc(zs.groupBy("a").agg(sum("v"))).contains("AggScan"))
    val g = zs.groupBy("a").agg(sum("v").as("s")).orderBy("a").collect()
    assert(g.map(_.getLong(1)).toSeq ==
      (0 until 4).map(a => (0 until 5).map(b => a * 100 + b * 7 - 30).sum.toLong))
  }

  test("grouped SUM/AVG push down when chunk extent is 1 along the grouped dim") {
    import spark.implicits._
    val out = Files.createTempDirectory("zarr_sum_gg").resolve("gg.zarr").toString
    val all = for { a <- 0 until 5; b <- 0 until 4 } yield (a.toLong, b.toLong,
      (a * 17 - b * 3).toLong)
    // drop some cells so one group mixes written + fill cells
    all.filter { case (a, b, _) => !(a == 2 && b >= 2) }
      .toDF("a", "b", "v").write.format("zarr")
      .option("coords", "a,b").option("chunkOuter", "1")
      .mode("overwrite").save(out)
    val z = spark.read.format("zarr").load(out)
    val pushed = z.groupBy("a").agg(sum("v").as("s"), avg("v").as("m"),
      count(lit(1)).as("n"))
    assert(scanDesc(pushed).contains("ZarrGroupAggScan"), scanDesc(pushed))
    val real = z.filter(col("v") > Long.MinValue)
      .groupBy("a").agg(sum("v").as("s"), avg("v").as("m"), count(lit(1)).as("n"))
    assert(!scanDesc(real).contains("AggScan"), scanDesc(real))
    assert(pushed.orderBy("a").collect().map(_.toSeq).toSeq ==
      real.orderBy("a").collect().map(_.toSeq).toSeq)
  }

  test("revoked attestation (the mid-append reader state) takes the exact real scan") {
    import java.nio.file.{Files => F, Paths}
    val out = Files.createTempDirectory("zarr_sum_r").resolve("r.zarr").toString
    writeIntStore(out)
    // strip the sums/total/complete records, keeping min/max entries —
    // exactly what append's revocation step writes before the shape
    // grows; a reader landing in that window must fall back
    val zstats = Paths.get(out, "v", ".zstats")
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(F.readAllBytes(zstats))
    val chunksOnly = s"""{"chunks": ${node.get("chunks").toString}}"""
    F.write(zstats, chunksOnly.getBytes)
    graft.sources.zarr.ChunkIO.invalidatePath(out)
    val z = spark.read.format("zarr").load(out)
    val df = z.agg(sum("v").as("s"), avg("v").as("m"))
    assert(!scanDesc(df).contains("AggScan"), scanDesc(df)) // no attestation → no pushdown
    val all = for { a <- 0 until 4; b <- 0 until 5 } yield (a * 100 + b * 7 - 30).toLong
    assert(df.collect().head.getLong(0) == all.sum) // real scan, exact
  }

  test("append merges sum partials: post-append pushdown equals one-shot write") {
    import spark.implicits._
    val out = Files.createTempDirectory("zarr_sum_a").resolve("a.zarr").toString
    val all = for { a <- 0 until 6; b <- 0 until 5 } yield (a.toLong, b.toLong,
      (a * 31 - b * 13).toLong)
    val (first, rest) = all.partition(_._1 < 4)
    first.toDF("a", "b", "v").write.format("zarr")
      .option("coords", "a,b").option("chunkOuter", "2")
      .mode("overwrite").save(out)
    rest.toDF("a", "b", "v").write.format("zarr")
      .option("coords", "a,b").option("chunkOuter", "2")
      .mode("append").save(out)
    val z = spark.read.format("zarr").load(out)
    val pushed = z.agg(sum("v"), avg("v"))
    assert(scanDesc(pushed).contains("ZarrAggScan"), scanDesc(pushed))
    val real = z.filter(col("v") > Long.MinValue).agg(sum("v"), avg("v"))
    assert(pushed.collect().head.toSeq == real.collect().head.toSeq)
    assert(pushed.collect().head.getLong(0) == all.map(_._3).sum)
  }
}
