package graft.sources.zarr

import org.apache.spark.sql.connector.metric.CustomTaskMetric
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}

/** Columnar reader for a Zarr partition slice: fills
  * `OnHeapColumnVector`s in 4K-row batches with an odometer walk over
  * the filtered grid — no per-row division, no boxing, and the
  * emitted `ColumnarBatch` feeds Spark's vectorized pipeline exactly
  * like the parquet reader does (the Spark-native analog of the
  * reference's single Arrow RecordBatch,
  * /root/reference/src/reader/zarr_reader.rs:417-432 — but batched and
  * parallel).
  *
  * Per data variable the reader tracks the current chunk and the flat
  * in-chunk offset incrementally: advancing the last dimension inside
  * one chunk is `offset += 1`; crossing any boundary recomputes from
  * the odometer (rare: once per chunk edge).
  */
class ZarrColumnarReader(p: ZarrInputPartition, batchSize: Int = 4096)
    extends PartitionReader[ColumnarBatch] {

  private val store = ZarrStore.open(p.storePath)
  private val nDims = p.ranges.length
  private val fields = p.projection.toArray
  private val types: Array[DataType] = fields.map {
    case CoordField(d) => p.coords(d).meta.dtype.sparkType
    case VarField(m) => m.dtype.sparkType
  }

  // odometer state: global indices per dimension for the current row
  private val idx = new Array[Int](nDims)
  private var row = p.rowStart
  GridMath.rowToIndices(row, p.ranges, idx)

  // per-var-field chunk state
  private final class VarState(val meta: ZarrArrayMeta) {
    val chunkIdx = new Array[Long](nDims)
    var chunk: AnyRef = _
    var offset: Long = -1
    var valid = false
    var bytesRead = 0L
    var chunksDecoded = 0L
    /** Payload size of the in-flight prefetch (pool thread writes,
      * consumer drains on pickup). */
    var prefetchBytes: java.util.concurrent.atomic.AtomicLong = _

    // Row-band LRU: the odometer revisits inner-dimension chunks once
    // per grid row; holding one band avoids chunk-extent× re-decodes
    // (see ChunkIO.bandCacheCap).
    private val bandCap = ChunkIO.bandCacheCap(meta, p.ranges)
    private val band =
      new java.util.LinkedHashMap[Seq[Long], AnyRef](8, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[Seq[Long], AnyRef]): Boolean = size() > bandCap
      }

    // With the band cache in place, cache MISSES occur in exact
    // C-order over the chunk grid restricted to this partition's
    // ranges — so a one-ahead prediction is precise, and prefetching
    // the predicted chunk overlaps its store latency (one object-store
    // round trip per chunk on remote backends) with the current
    // chunk's decode/emit.
    private val chunkLo = Array.tabulate(nDims)(d => p.ranges(d)._1 / meta.chunks(d))
    private val chunkHi = Array.tabulate(nDims)(d =>
      math.max(p.ranges(d)._1, p.ranges(d)._2 - 1) / meta.chunks(d))
    private var pending: (Seq[Long], java.util.concurrent.Future[AnyRef]) = null

    private def nextChunkKey(cur: Seq[Long]): Seq[Long] = {
      val n = cur.toArray
      var d = nDims - 1
      while (d >= 0) {
        if (n(d) < chunkHi(d)) { n(d) += 1; return n.toSeq }
        n(d) = chunkLo(d)
        d -= 1
      }
      null
    }

    private def fetch(key: Seq[Long]): AnyRef = {
      if (pending != null && pending._1 == key) {
        val f = pending._2
        pending = null
        val a = try f.get()
        catch { case e: java.util.concurrent.ExecutionException => throw e.getCause }
        if (prefetchBytes != null) { bytesRead += prefetchBytes.get(); prefetchBytes = null }
        a
      } else {
        // mispredicted prefetch: its bytes were still fetched — drain
        // them into the metric before reading the chunk actually needed
        drainPending()
        ChunkIO.readChunkCached(store, meta, key, p.chunkCacheEntries,
          bytesRead += _)
      }
    }

    /** Settle an in-flight prefetch whose result will never be picked
      * up by [[fetch]] (misprediction, or the partition ended
      * mid-prefetch): wait for it — the fetched chunk lands in the
      * shared cache either way, so the work is not lost — and account
      * its bytes, keeping zarrBytesRead equal to what was actually
      * read from the store. */
    def drainPending(): Unit = if (pending != null) {
      val f = pending._2
      pending = null
      try f.get() catch { case _: Throwable => () }
      if (prefetchBytes != null) { bytesRead += prefetchBytes.get(); prefetchBytes = null }
    }

    def locate(): Unit = {
      var changed = !valid
      var d = 0
      while (d < nDims) {
        val c = idx(d) / meta.chunks(d)
        if (!valid || c != chunkIdx(d)) { changed = true }
        d += 1
      }
      if (changed) {
        d = 0
        while (d < nDims) { chunkIdx(d) = idx(d) / meta.chunks(d); d += 1 }
        val key = chunkIdx.toSeq
        val hit = band.get(key)
        if (hit != null) chunk = hit
        else {
          // bytesRead reported from inside the read (no extra sizeOf
          // round trip per chunk on remote stores)
          chunk = fetch(key)
          chunksDecoded += 1
          band.put(key, chunk)
          if (p.prefetch && pending == null) {
            val nk = nextChunkKey(key)
            if (nk != null && band.get(nk) == null) {
              // the pool thread must not touch this task's bytesRead
              // var; it accumulates into an atomic the consumer drains
              val sz = new java.util.concurrent.atomic.AtomicLong()
              prefetchBytes = sz
              pending = (nk, ChunkIO.prefetchPool.submit(
                new java.util.concurrent.Callable[AnyRef] {
                  override def call(): AnyRef =
                    ChunkIO.readChunkCached(store, meta, nk, p.chunkCacheEntries,
                      sz.addAndGet(_))
                }))
            }
          }
        }
        valid = true
      }
      var off = 0L
      d = 0
      while (d < nDims) { off = off * meta.chunks(d) + (idx(d) % meta.chunks(d)); d += 1 }
      offset = off
    }

    /** Fast path: the last dimension advanced by one and stayed inside
      * the same chunk. */
    def advanceWithinRow(): Boolean = {
      val last = nDims - 1
      if (idx(last) / meta.chunks(last) == chunkIdx(last)) { offset += 1; true }
      else false
    }
  }

  private val varStates: Array[VarState] = fields.collect { case VarField(m) => new VarState(m) }
  private var batch: ColumnarBatch = _

  override def next(): Boolean = {
    if (row >= p.rowEnd) return false
    val n = math.min(batchSize.toLong, p.rowEnd - row).toInt
    val vectors = types.map(t => new OnHeapColumnVector(n, t))
    var r = 0
    while (r < n) {
      // locate all var fields for this row
      var vs = 0
      var f = 0
      while (f < fields.length) {
        fields(f) match {
          case CoordField(d) => putValue(vectors(f), r, types(f), p.coords(d).raw, idx(d))
          case VarField(_) =>
            val st = varStates(vs)
            if (st.offset < 0 || !st.valid) st.locate()
            if (p.fillAsNull &&
                ChunkCodec.isFill(st.meta.fillValue,
                  ChunkCodec.elementAt(st.chunk, st.offset.toInt)))
              vectors(f).putNull(r)
            else putValue(vectors(f), r, types(f), st.chunk, st.offset.toInt)
            vs += 1
        }
        f += 1
      }
      r += 1
      row += 1
      if (r < n) advanceOdometer()
    }
    if (row < p.rowEnd) advanceOdometer()
    batch = new ColumnarBatch(vectors.map(_.asInstanceOf[ColumnVector]), n)
    true
  }

  /** Increment the odometer to the next row; maintain var-field chunk
    * state incrementally. `lastOnly` = only the last dimension moved
    * (the overwhelmingly common case), which enables the offset++
    * fast path. */
  private def advanceOdometer(): Unit = {
    val last = nDims - 1
    idx(last) += 1
    val lastOnly = idx(last) < p.ranges(last)._2
    if (!lastOnly) {
      idx(last) = p.ranges(last)._1
      var d = last - 1
      var carry = true
      while (d >= 0 && carry) {
        idx(d) += 1
        if (idx(d) >= p.ranges(d)._2) idx(d) = p.ranges(d)._1 else carry = false
        d -= 1
      }
    }
    var vs = 0
    while (vs < varStates.length) {
      val st = varStates(vs)
      if (!(lastOnly && st.valid && st.advanceWithinRow())) st.locate()
      vs += 1
    }
  }

  override def get(): ColumnarBatch = batch

  override def close(): Unit = {
    // a partition can end (or be limit-cut) with a prefetch in flight;
    // its bytes must land in the metric before the task reports it
    varStates.foreach(_.drainPending())
    if (batch != null) batch.close()
  }

  override def currentMetricsValues(): Array[CustomTaskMetric] = {
    def m(n: String, v: Long): CustomTaskMetric = new CustomTaskMetric {
      override def name(): String = n
      override def value(): Long = v
    }
    val bytes = varStates.map(_.bytesRead).sum
    val chunks = varStates.map(_.chunksDecoded).sum
    val base = Array(m("zarrBytesRead", bytes), m("zarrChunksDecoded", chunks))
    // union-member partitions double-report under the member-ordinal
    // metric so the union scan can attribute IO per store
    if (p.memberIdx < 0) base
    else base ++ Array(m(s"zarrBytesRead.m${p.memberIdx}", bytes),
      m(s"zarrChunksDecoded.m${p.memberIdx}", chunks))
  }

  private def putValue(v: OnHeapColumnVector, r: Int, t: DataType, arr: AnyRef, i: Int): Unit =
    t match {
      case LongType | TimestampType => v.putLong(r, arr.asInstanceOf[Array[Long]](i))
      case IntegerType => v.putInt(r, arr.asInstanceOf[Array[Int]](i))
      case DoubleType => v.putDouble(r, arr.asInstanceOf[Array[Double]](i))
      case FloatType => v.putFloat(r, arr.asInstanceOf[Array[Float]](i))
      case ShortType => v.putShort(r, arr.asInstanceOf[Array[Short]](i))
      case ByteType => v.putByte(r, arr.asInstanceOf[Array[Byte]](i))
      case BooleanType => v.putBoolean(r, arr.asInstanceOf[Array[Boolean]](i))
      case StringType =>
        val b = arr.asInstanceOf[Array[String]](i)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        v.putByteArray(r, b)
      case other => throw new IllegalStateException(s"Unsupported columnar type $other")
    }
}
