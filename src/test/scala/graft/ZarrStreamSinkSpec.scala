package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.zarr.ZarrStreamSink

/** One-shot task-failure injection for the executor-loss tests: a
  * mapPartitions stage ticks this on every partition COMPUTE; when the
  * global tick count reaches the armed threshold the task dies once.
  * Static (test JVM = executor JVM in local mode), thread-safe. */
object SinkFaultInjection {
  val ticks = new java.util.concurrent.atomic.AtomicLong(0)
  @volatile var armAt: Long = Long.MaxValue
  def reset(arm: Long): Unit = { ticks.set(0); armAt = arm }
  def tick(): Unit =
    if (ticks.incrementAndGet() == armAt)
      throw new RuntimeException("injected task failure (SinkFaultInjection)")
}

/** `df.writeStream.format("zarr")` — per-micro-batch outer-dimension
  * append. Completes the streaming loop whose read half ZarrStreamSpec
  * covers: a Zarr store on both ends of a pipeline. */
class ZarrStreamSinkSpec extends AnyFunSuite {
  import TestSession._

  private def slab(ts: Seq[Long]) = {
    import spark.implicits._
    ts.flatMap(t => (0L until 3L).map(x => (t, x, t * 10.0 + x)))
      .toDF("t", "x", "v")
  }

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("s.zarr").toString

  private def readBack(path: String): Seq[Seq[Any]] =
    spark.read.format("zarr").load(path).orderBy("t", "x")
      .collect().map(_.toSeq).toSeq

  test("memory stream → zarr sink: first batch creates, later batches append") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val out = tmp("zarr_sink")
    val in = MemoryStream[(Long, Long, Double)]
    val q = in.toDF().toDF("t", "x", "v")
      .writeStream.outputMode("append").format("zarr")
      .option("path", out)
      .option("coords", "t,x").option("chunkOuter", "2")
      .option("checkpointLocation", Files.createTempDirectory("zarr_sink_ckpt").toString)
      .start()
    try {
      in.addData(slab(Seq(0L, 1L)).as[(Long, Long, Double)].collect().toSeq: _*)
      q.processAllAvailable()
      assert(readBack(out) == slab(Seq(0L, 1L)).orderBy("t", "x").collect().map(_.toSeq).toSeq)
      in.addData(slab(Seq(2L, 3L)).as[(Long, Long, Double)].collect().toSeq: _*)
      q.processAllAvailable()
      assert(readBack(out) == slab(0L to 3L).orderBy("t", "x").collect().map(_.toSeq).toSeq)
    } finally q.stop()
  }

  test("batch replay is exactly-once: marker skip and value-level filter") {
    val out = tmp("zarr_sink_replay")
    val sink = new ZarrStreamSink(Map(
      "path" -> out, "coords" -> "t,x", "chunkouter" -> "2"))
    sink.addBatch(0, slab(Seq(0L, 1L)))
    val after0 = readBack(out)
    // whole-batch re-delivery (restart replay): marker short-circuits
    sink.addBatch(0, slab(Seq(0L, 1L)))
    assert(readBack(out) == after0)
    // crash-between-append-and-marker: same batch id re-delivered by a
    // NEW sink instance whose marker was never written — value filter
    // must drop the already-landed slabs instead of failing append's
    // strictly-after check
    val sink2 = new ZarrStreamSink(Map("path" -> out))
    sink2.addBatch(1, slab(Seq(0L, 1L, 2L, 3L))) // 0,1 already in store
    assert(readBack(out) == slab(0L to 3L).orderBy("t", "x").collect().map(_.toSeq).toSeq)
    // replay of a fully-applied batch with a stale marker: no-op
    sink2.addBatch(1, slab(Seq(2L, 3L)))
    assert(readBack(out) == slab(0L to 3L).orderBy("t", "x").collect().map(_.toSeq).toSeq)
  }

  test("datetime outer coordinate: replay filters by instant cutoff") {
    import spark.implicits._
    def slabT(secs: Seq[Long]) =
      secs.flatMap(t => (0L until 2L).map(x =>
        (java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(t)), x, t * 1.0 + x)))
        .toDF("ts", "x", "v")
    val out = tmp("zarr_sink_dt")
    val sink = new ZarrStreamSink(Map(
      "path" -> out, "coords" -> "ts,x", "chunkouter" -> "1"))
    sink.addBatch(0, slabT(Seq(0L, 60L)))
    // crash-between-append-and-marker replay on a NEW sink instance:
    // the datetime branch compares raw epoch-micros as Instants — the
    // already-landed slabs (0, 60) must filter out, only 120 appends
    val sink2 = new ZarrStreamSink(Map("path" -> out))
    sink2.addBatch(1, slabT(Seq(0L, 60L, 120L)))
    val got = spark.read.format("zarr").load(out).orderBy("ts", "x").collect()
    assert(got.length == 6)
    assert(got.map(_.getDouble(2)).toSeq ==
      Seq(0.0, 1.0, 60.0, 61.0, 120.0, 121.0))
    assert(got.map(r => r.getAs[java.sql.Timestamp]("ts").toInstant.getEpochSecond)
      .toSeq == Seq(0L, 0L, 60L, 60L, 120L, 120L))
  }

  test("micro-batch re-wrap is RDD-backed — no LocalTableScan of collected rows") {
    import org.apache.spark.sql.graftbridge.DataFrameBridge
    val df = slab(Seq(0L, 1L))
    val wrapped = DataFrameBridge.fromInternalRows(
      spark, DataFrameBridge.internalRows(df), df.schema)
    val plan = wrapped.queryExecution.executedPlan.toString
    // the sink's append path runs over this wrapper: distributed scan of
    // executor-resident rows, never a driver-collected local relation
    assert(plan.contains("ExistingRDD"), plan)
    assert(!plan.contains("LocalTableScan"), plan)
    assert(wrapped.orderBy("t", "x").collect().map(_.toSeq).toSeq ==
      df.orderBy("t", "x").collect().map(_.toSeq).toSeq)
  }

  test("non-append output modes are rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      new graft.sources.zarr.ZarrDataSource().createSink(
        spark.sqlContext, Map("path" -> tmp("zarr_sink_mode")),
        Nil, OutputMode.Complete())
    }
    assert(e.getMessage.contains("Append output mode only"))
  }

  test("stateful upstream (watermarked windowed agg) appends correctly") {
    // exercises the executor-side re-wrap against an IncrementalExecution
    // that PLANS STATE STORES: the batch DF must not be re-planned
    // outside the incremental planner (DataFrameBridge takes the
    // already-planned toRdd), and the append's several actions must see
    // consistent rows via the persist
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val out = tmp("zarr_sink_stateful")
    val in = MemoryStream[(Long, Double)] // (epoch-sec, value)
    val q = in.toDF().toDF("sec", "v")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "10 seconds").as("w"))
      .agg(sum("v").as("total"))
      .select(unix_timestamp(col("w.start")).as("t"), col("total"))
      .writeStream.outputMode("append").format("zarr")
      .option("path", out)
      .option("coords", "t").option("chunkOuter", "1")
      .option("checkpointLocation",
        Files.createTempDirectory("zarr_sink_stateful_ckpt").toString)
      .start()
    try {
      in.addData((0L, 1.0), (5L, 2.0), (12L, 4.0))
      q.processAllAvailable() // watermark still at 0 — nothing finalized
      in.addData((25L, 8.0))
      q.processAllAvailable() // watermark 12 → window [0,10) closes
      in.addData((43L, 16.0))
      q.processAllAvailable() // watermark 25 → windows [10,20) and [20,30) close
      val got = spark.read.format("zarr").load(out).orderBy("t")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == Seq((0L, 3.0), (10L, 4.0), (20L, 8.0)), got)
    } finally q.stop()
  }

  test("zarr → zarr streaming copy: source and sink compose") {
    val src = tmp("zarr_copy_src")
    val dst = tmp("zarr_copy_dst")
    slab(Seq(0L, 1L)).write.format("zarr")
      .option("coords", "t,x").option("chunkOuter", "2")
      .mode("overwrite").save(src)
    val q = spark.readStream.format("zarr").load(src)
      .writeStream.outputMode("append").format("zarr")
      .option("path", dst)
      .option("coords", "t,x").option("chunkOuter", "2")
      .option("checkpointLocation", Files.createTempDirectory("zarr_copy_ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      slab(Seq(2L, 3L)).write.format("zarr").mode("append").save(src)
      q.processAllAvailable()
    } finally q.stop()
    assert(readBack(dst) == readBack(src))
    assert(readBack(dst) == slab(0L to 3L).orderBy("t", "x").collect().map(_.toSeq).toSeq)
  }

  /** The append input with the fault-injection stage spliced in. */
  private def failingSlab(ts: Seq[Long]) = {
    import spark.implicits._
    slab(ts).as[(Long, Long, Double)]
      .mapPartitions { it => SinkFaultInjection.tick(); it }
      .toDF("t", "x", "v")
  }

  test("task death at EVERY append compute point leaves a consistent prefix; retry lands") {
    // Executor-loss sweep: arm a one-shot task failure at injection
    // point k = 1, 2, 3, … — the failure fires inside whichever append
    // action computes the input's k-th partition (validation aggregate,
    // coordinate distinct, or the chunk-write job itself). In local
    // mode spark.task.maxFailures=1, so the task death fails the whole
    // append — the STORE invariant under test: a failed append is
    // invisible (chunks-before-metadata ordering: orphan chunk files
    // past the extent don't exist to readers) and a plain retry of the
    // same batch lands exactly once. The sweep ends at the first k no
    // action reaches — every task boundary in the append path has then
    // been killed once.
    val base = slab(Seq(0L, 1L)).orderBy("t", "x").collect().map(_.toSeq).toSeq
    val full = slab(0L to 3L).orderBy("t", "x").collect().map(_.toSeq).toSeq
    var k = 1L
    var done = false
    while (!done) {
      assert(k <= 64, s"fault-injection sweep did not terminate by k=$k")
      val out = tmp(s"zarr_sink_kill$k")
      slab(Seq(0L, 1L)).write.format("zarr")
        .option("coords", "t,x").option("chunkOuter", "2")
        .mode("overwrite").save(out)
      SinkFaultInjection.reset(arm = k)
      try {
        graft.sources.zarr.ZarrWriter.append(failingSlab(Seq(2L, 3L)), out)
        done = true // k beyond the last compute point: append succeeded
      } catch {
        case _: Throwable =>
          // mid-append death: the store must still read as EXACTLY the
          // pre-append content — no partial slabs, no torn metadata
          SinkFaultInjection.reset(arm = Long.MaxValue)
          assert(readBack(out) == base, s"store inconsistent after task death at k=$k")
          // retry of the same batch lands in full
          graft.sources.zarr.ZarrWriter.append(slab(Seq(2L, 3L)), out)
      }
      SinkFaultInjection.reset(arm = Long.MaxValue)
      assert(readBack(out) == full, s"retry after task death at k=$k did not land")
      k += 1
    }
    assert(k > 2, "sweep never injected a failure — injection stage not reached")
  }

  test("streaming query killed by a task death mid-batch: restart is exactly-once") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val out = tmp("zarr_sink_restart")
    val ckpt = Files.createTempDirectory("zarr_sink_restart_ckpt").toString
    val in = MemoryStream[(Long, Long, Double)]
    def start() = in.toDF().toDF("t", "x", "v")
      .as[(Long, Long, Double)]
      .mapPartitions { it => SinkFaultInjection.tick(); it }
      .toDF("t", "x", "v")
      .writeStream.outputMode("append").format("zarr")
      .option("path", out)
      .option("coords", "t,x").option("chunkOuter", "2")
      .option("checkpointLocation", ckpt)
      .start()
    SinkFaultInjection.reset(arm = Long.MaxValue)
    val q1 = start()
    try {
      in.addData(slab(Seq(0L, 1L)).as[(Long, Long, Double)].collect().toSeq: _*)
      q1.processAllAvailable()
      // arm: the NEXT batch dies mid-flight and takes the query down
      SinkFaultInjection.reset(arm = 1)
      in.addData(slab(Seq(2L, 3L)).as[(Long, Long, Double)].collect().toSeq: _*)
      intercept[Exception] { q1.processAllAvailable(); assert(false, "batch survived armed fault") }
    } finally {
      SinkFaultInjection.reset(arm = Long.MaxValue)
      q1.stop()
    }
    // restart from the same checkpoint: the failed batch replays; the
    // commit marker + extent filter make the replay exactly-once even
    // if the dead attempt landed some slabs
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(readBack(out) == slab(0L to 3L).orderBy("t", "x").collect().map(_.toSeq).toSeq)
  }
}
