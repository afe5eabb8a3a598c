package graft.fuzz

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import java.nio.file.{Files, Paths}

/** Zarr-connector differential fuzz dump: run N seeded [[ZarrFuzz]]
  * queries on Spark (zarr grid tables + parquet dimensions), write each
  * result to `<outDir>/<name>` parquet and the texts to
  * `<outDir>/oracle_sql.json` — the [[graft.Verify]] layout, so
  * `tools/compare.py <tablesDir> <outDir>` hash-compares against DuckDB
  * unchanged. `<tablesDir>` (= `<outDir>_tables`) is populated with the
  * grids' parquet exports plus links to the sf corpus, so the oracle
  * sees the same relations under the same names.
  *
  * Beyond pass/fail, the runner counts which seeds' physical plans
  * actually exercised each connector pushdown (coordinate ranges, TopN,
  * limit, whole-grid and grouped metadata aggregates) and FAILS if any
  * family went unexercised — a fuzz run that never pushes anything
  * would silently test only the post-scan engine.
  *
  * Usage: graft.fuzz.ZarrFuzzRun <sfDir> <outDir> [nSeeds] [seed0]
  */
object ZarrFuzzRun {

  /** All DSv2 scan descriptions in the plan, descending through AQE. */
  private[graft] def scanDescs(plan: SparkPlan): Seq[String] = {
    val here = plan.collect {
      case b: BatchScanExec => Seq(b.scan.description())
      case a: AdaptiveSparkPlanExec => scanDescs(a.executedPlan)
    }.flatten
    // collect() does not descend into AdaptiveSparkPlanExec (leaf-like
    // wrapper); the recursive case above handles one level, and nested
    // AQE subplans recurse again.
    here
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: graft.fuzz.ZarrFuzzRun <sfDir> <outDir> [nSeeds] [seed0]")
      sys.exit(2)
    }
    val Array(sfDir, outDir) = args.take(2)
    val nSeeds = if (args.length > 2) args(2).toInt else 250
    val seed0 = if (args.length > 3) args(3).toLong else 0L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // oracle relations: grid exports + the sf corpus under one dir
    val tablesDir = s"${outDir}_tables"
    new java.io.File(outDir).mkdirs()
    ZarrFuzz.buildFixtures(spark, tablesDir)
    graft.operators.Tables.all.foreach { t =>
      val link = Paths.get(tablesDir, s"$t.parquet")
      if (!Files.exists(link))
        Files.createSymbolicLink(link, Paths.get(sfDir, s"$t.parquet").toAbsolutePath)
    }
    graft.operators.Tables.views(spark, sfDir, "nation", "region", "orders")

    val markers = scala.collection.mutable.Map(
      "coord_range" -> 0, "topn" -> 0, "limit" -> 0,
      "agg_meta" -> 0, "group_agg_meta" -> 0,
      // grammar v3: pushdown composition over the sharded-v3 fixture
      // and the multi-store union's executor-merged aggregates
      "shard_range" -> 0, "union_agg" -> 0, "union_group_agg" -> 0)
      .withDefaultValue(0)
    var failed = 0
    val sqls = (seed0 until seed0 + nSeeds).map { seed =>
      val name = ZarrFuzz.name(seed)
      val sql = ZarrFuzz.gen(seed)
      try {
        val df = spark.sql(sql)
        df.write.mode("overwrite").parquet(s"$outDir/$name")
        val descs = scanDescs(df.queryExecution.executedPlan)
        if (descs.exists(d => d.contains("pushedFilters=[") && !d.contains("pushedFilters=[]")))
          markers("coord_range") += 1
        if (descs.exists(_.contains(" topN="))) markers("topn") += 1
        // coordinate-prefix TopN pushes as either limit (ASC) or
        // offset (DESC) — both count as the limit-subset family
        val off = "offset=(\\d+)".r
        if (descs.exists(d => (d.contains("limit=") && !d.contains("limit=-1")) ||
            off.findFirstMatchIn(d).exists(_.group(1) != "0")))
          markers("limit") += 1
        if (descs.exists(_.contains("ZarrGroupAggScan"))) markers("group_agg_meta") += 1
        else if (descs.exists(_.contains("ZarrAggScan"))) markers("agg_meta") += 1
        if (descs.exists(_.contains("ZarrUnionGroupAggScan"))) markers("union_group_agg") += 1
        else if (descs.exists(_.contains("ZarrUnionAggScan"))) markers("union_agg") += 1
        // coordinate pushdown composed over the sharded-v3 read path
        if (sql.contains("grid_e") &&
            descs.exists(d => d.contains("pushedFilters=[") && !d.contains("pushedFilters=[]")))
          markers("shard_range") += 1
      } catch { case e: Exception =>
        failed += 1
        System.err.println(s"[zarr-fuzz] $name FAILED on spark: ${e.getMessage}\n$sql")
      }
      name -> sql
    }
    val json = sqls.map { case (n, s) =>
      "\"" + n + "\": " + "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n") + "\""
    }.mkString("{", ",\n", "}")
    Files.write(Paths.get(s"$outDir/oracle_sql.json"), json.getBytes("UTF-8"))
    val stats = markers.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}")
    Files.write(Paths.get(s"$outDir/fuzz_meta.json"),
      (s"""{"grammar": "zarr", "grammar_version": ${ZarrFuzz.grammarVersion}, """ +
        s""""seed0": $seed0, "n_seeds": $nSeeds, "pushdowns": $stats}""").getBytes("UTF-8"))
    println(s"[zarr-fuzz] ${nSeeds - failed}/$nSeeds queries ran " +
      s"(grammar v${ZarrFuzz.grammarVersion}); pushdown seeds: $stats; results in $outDir")
    // every pushdown family must have been exercised by SOME seed —
    // thresholds are deliberately low (shape mix is random) but nonzero
    val unexercised = markers.filter(_._2 == 0).keys.toSeq.sorted
    spark.stop()
    if (failed > 0 || unexercised.nonEmpty) {
      if (unexercised.nonEmpty)
        System.err.println(s"[zarr-fuzz] pushdown families never exercised: ${unexercised.mkString(", ")}")
      sys.exit(1)
    }
  }
}
