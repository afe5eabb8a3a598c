package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.zarr.{VarField, ZarrColumnarReader, ZarrInputPartition, ZarrMeta}

/** zarrBytesRead accounting around prefetch: every byte actually
  * fetched from the store must land in the metric, including a
  * prefetch that is still in flight (or mispredicted) when the
  * partition ends — the close()/drain path. */
class ZarrPrefetchMetricSpec extends AnyFunSuite {
  import TestSession._

  private def mkStore(): String = {
    import spark.implicits._
    val out = Files.createTempDirectory("zarr_pfm").resolve("s.zarr").toString
    (0L until 4L).flatMap(t => (0L until 3L).map(x => (t, x, t * 10.0 + x)))
      .toDF("t", "x", "v")
      .write.format("zarr").option("coords", "t,x").option("chunkOuter", "2")
      .mode("overwrite").save(out)
    out
  }

  private def partition(path: String, prefetch: Boolean): ZarrInputPartition = {
    val meta = ZarrMeta.readStore(path)
    ZarrInputPartition(path, 0L, meta.totalRows,
      meta.coords.map(c => (0, c.length)).toArray, meta.coords,
      Seq(VarField(meta.dataVars.head)), prefetch = prefetch)
  }

  private def bytesMetric(r: ZarrColumnarReader): Long =
    r.currentMetricsValues().find(_.name() == "zarrBytesRead").get.value()

  test("partition ending mid-prefetch still accounts the prefetched bytes") {
    val path = mkStore()
    // ground truth: a full non-prefetch scan of both chunks
    val full = new ZarrColumnarReader(partition(path, prefetch = false))
    while (full.next()) {}
    val allBytes = bytesMetric(full)
    full.close()
    assert(allBytes > 0)
    // tiny batch: the first next() decodes chunk 0 and submits the
    // prefetch of chunk 1; closing here abandons that future mid-flight
    val r = new ZarrColumnarReader(partition(path, prefetch = true), batchSize = 2)
    assert(r.next())
    r.close()
    assert(bytesMetric(r) == allBytes,
      s"metric ${bytesMetric(r)} != actual bytes fetched $allBytes")
  }
}
