package graft
import org.apache.spark.sql.SparkSession

/** Dev-loop single-query timer: warmup + N timed runs of one query,
  * same session config as [[Bench]]. Usage:
  *   tools/run.sh graft.BenchOne <name> [sfDir] [runs]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    (1 to runs + 1).foreach { i =>
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      val n = df.count()
      val dt = (System.nanoTime() - t0) / 1e9
      val dc = (t1 - t0) / 1e9
      println(f"[benchone] $name run$i%d: $dt%.3f s (build $dc%.3f s, $n rows)" +
        (if (i == 1) " (warmup)" else ""))
    }
    spark.stop()
  }
}
