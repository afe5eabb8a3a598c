package graft.sources.zarr

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed Zarr store writer (v2 or v3) — the sink the reference
  * lists as roadmap ("output formats", /root/reference/README.md:305).
  * Writes a complete-grid DataFrame (coordinate columns +
  * data-variable columns) as a Zarr store: coordinates as 1-D arrays,
  * variables chunked `(chunkOuter, full inner dims)` like the
  * reference fixtures. v2 emits `.zgroup`/`.zarray`/`.zattrs` with
  * dotted chunk keys; v3 emits `zarr.json` documents (bytes codec,
  * little-endian, inline attributes) with `c/`-prefixed chunk keys.
  *
  * Distribution model: rows are repartitioned by outer-chunk id, so
  * each executor task owns whole chunk slabs and writes its chunk
  * files directly — the driver only writes metadata and the (small)
  * coordinate arrays. One chunk slab (chunkOuter × inner rows ×
  * element size) must fit in task memory, the same constraint any
  * chunked-format writer has.
  *
  * Contract: the input must cover the full cartesian product of its
  * coordinate values at most once; missing cells become `fill_value`
  * (0). All IO goes through [[ZarrStore]], so any writable backend
  * (local, hdfs://, s3a://, …) works; executors open their own store
  * handle from the serialized descriptor.
  */
object ZarrWriter {

  /** Default cap on a single dimension's coordinate count (16 Mi —
    * ~128 MB of driver heap for a long coordinate). Coordinate arrays
    * are Zarr metadata and live whole on the driver, so a dimension
    * above this is refused loudly before any collect (override with
    * `maxDimLen` / the `maxDimLen` write option). */
  val defaultMaxDimLen: Int = 1 << 24

  private def dtypeOf(t: DataType): (String, Int) = t match {
    case LongType => ("<i8", 8)
    case IntegerType => ("<i4", 4)
    case ShortType => ("<i2", 2)
    case ByteType => ("|i1", 1)
    case DoubleType => ("<f8", 8)
    case FloatType => ("<f4", 4)
    case BooleanType => ("|b1", 1)
    // datetime64[us] — the reader's canonical unit, so a zarr-read
    // timestamp coordinate round-trips losslessly (v2 stores only; v3
    // core has no datetime type)
    case TimestampType => ("<M8[us]", 8)
    case other => throw new IllegalArgumentException(s"Unsupported Zarr write type: $other")
  }

  /** Coordinate dtype, which unlike data variables may be fixed-width
    * ASCII: width = longest value (`|S<w>`, NUL-padded like numpy). */
  private def coordDtype(t: DataType, vals: Array[Any]): (String, Int) = t match {
    case StringType =>
      val w = math.max(1, vals.map(_.asInstanceOf[String]
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII).length).max)
      (s"|S$w", w)
    case other => dtypeOf(other)
  }

  /** Effective data-variable dtype: `uintColumns` stores an integral
    * column as unsigned of `w` bytes (`|u1`/`<u2`/`<u4`/`<u8`). Spark
    * has no unsigned types, so reads widen per SURVEY §1.5 (u1→Short,
    * u2→Int, u4/u8→Long); writing that widened type back through
    * `uintColumns` round-trips losslessly — every element is
    * range-checked at serialization time. */
  private def varDtype(name: String, t: DataType, uint: Map[String, Int]): (String, Int) =
    uint.get(name) match {
      case Some(w) =>
        require(Set(1, 2, 4, 8)(w),
          s"uintColumns width for '$name' must be 1, 2, 4 or 8 bytes, got $w")
        t match {
          case ByteType | ShortType | IntegerType | LongType => ()
          case other => throw new IllegalArgumentException(
            s"uintColumns column '$name' must be an integral type, got $other")
        }
        (if (w == 1) "|u1" else s"<u$w", w)
      case None => dtypeOf(t)
    }

  /** Serialize one element as unsigned little-endian of `w` bytes.
    * Range-checked, so a read (which widens back to the signed Spark
    * type) returns exactly the written value. */
  private def putUint(buf: ByteBuffer, offset: Int, w: Int, v: Any): Unit = {
    val x = v match {
      case n: java.lang.Number => n.longValue()
      case other => throw new IllegalArgumentException(s"not an integer: $other")
    }
    val max = if (w == 8) Long.MaxValue else (1L << (8 * w)) - 1
    require(x >= 0 && x <= max, s"value $x out of range for uint${8 * w}")
    w match {
      case 1 => buf.put(offset, x.toByte)
      case 2 => buf.putShort(offset * 2, x.toShort)
      case 4 => buf.putInt(offset * 4, x.toInt)
      case _ => buf.putLong(offset * 8, x)
    }
  }

  /** Parse a `[sum, count]` JSON fragment produced by the stat
    * emitters (exact: integral sums stay BigDecimal-precise). */
  private def parseSumJson(sj: String): (java.math.BigDecimal, Long) = {
    val body = sj.trim.stripPrefix("[").stripSuffix("]").split(",")
    (new java.math.BigDecimal(body(0).trim), body(1).trim.toLong)
  }

  private def epochMicros(v: Any): Long = v match {
    case t: java.sql.Timestamp =>
      Math.addExact(Math.multiplyExact(Math.floorDiv(t.getTime, 1000L), 1000000L),
        (t.getNanos / 1000).toLong)
    case i: java.time.Instant =>
      Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L), (i.getNano / 1000).toLong)
    case other => throw new IllegalArgumentException(s"Not a timestamp: $other")
  }

  private def compressorJson(c: String): String = c match {
    case "none" => "null"
    case "zstd" => """{"id":"zstd","level":3}"""
    case "gzip" => """{"id":"gzip","level":5}"""
    case "zlib" => """{"id":"zlib","level":6}"""
    case "blosc" => """{"id":"blosc","cname":"lz4","clevel":5,"shuffle":1}"""
    case other => throw new IllegalArgumentException(
      s"Unsupported write compressor: $other (use none, blosc, zlib, zstd or gzip)")
  }

  /** Compress one chunk payload for writing (readers decode any of
    * these). zstd default level 3: the object-store sweet spot —
    * decode speed close to lz4, ratio close to zlib. blosc =
    * byte-shuffle + LZ4 frames ([[ChunkCodec.bloscCompress]]), the
    * reference fixtures' codec. */
  private def compressPayload(raw: Array[Byte], c: String, typesize: Int): Array[Byte] =
    c match {
      case "none" => raw
      case "zstd" => com.github.luben.zstd.Zstd.compress(raw, 3)
      case "blosc" => ChunkCodec.bloscCompress(raw, typesize)
      case "gzip" =>
        val bos = new java.io.ByteArrayOutputStream()
        val g = new java.util.zip.GZIPOutputStream(bos) {
          `def`.setLevel(5)
        }
        g.write(raw); g.close()
        bos.toByteArray
      case "zlib" =>
        val d = new java.util.zip.Deflater(6)
        d.setInput(raw); d.finish()
        val bos = new java.io.ByteArrayOutputStream(raw.length / 2 + 16)
        val buf = new Array[Byte](8192)
        while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
        d.end()
        bos.toByteArray
    }

  /** Delta-eligible on WRITE: exact-integer element types only. Float
    * delta exists in numcodecs but float add/subtract does not
    * round-trip bit-exactly, so the writer refuses to produce it. */
  private def deltaEligible(t: DataType): Boolean = t match {
    case LongType | IntegerType | ShortType | ByteType | TimestampType => true
    case _ => false
  }

  /** numcodecs `delta` encode over a serialized LE chunk payload:
    * first element kept, each later element replaced by its difference
    * from the previous (the read side integrates — ChunkCodec
    * .deltaDecode). Regular grids (time steps, sequential ids) become
    * near-constant streams, which is where the compressor ratio comes
    * from. */
  private def deltaEncode(raw: Array[Byte], width: Int): Array[Byte] = {
    val buf = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    width match {
      case 8 =>
        val n = raw.length / 8
        var prev = if (n > 0) buf.getLong(0) else 0L
        var i = 1
        while (i < n) { val cur = buf.getLong(i * 8); buf.putLong(i * 8, cur - prev); prev = cur; i += 1 }
      case 4 =>
        val n = raw.length / 4
        var prev = if (n > 0) buf.getInt(0) else 0
        var i = 1
        while (i < n) { val cur = buf.getInt(i * 4); buf.putInt(i * 4, cur - prev); prev = cur; i += 1 }
      case 2 =>
        val n = raw.length / 2
        var prev = if (n > 0) buf.getShort(0) else 0.toShort
        var i = 1
        while (i < n) { val cur = buf.getShort(i * 2); buf.putShort(i * 2, (cur - prev).toShort); prev = cur; i += 1 }
      case 1 =>
        var prev = if (raw.length > 0) raw(0) else 0.toByte
        var i = 1
        while (i < raw.length) { val cur = raw(i); raw(i) = (cur - prev).toByte; prev = cur; i += 1 }
      case other => throw new IllegalArgumentException(s"delta filter not writable at width $other")
    }
    raw
  }

  private def zarray(shape: Seq[Long], chunks: Seq[Int], dtype: String,
      compressor: String, delta: Boolean = false): String = {
    val fill = if (dtype.startsWith("|S")) "null" else "0"
    val filters =
      if (delta) s"""[{"id":"delta","dtype":"$dtype"}]""" else "null"
    s"""{"zarr_format":2,"shape":[${shape.mkString(",")}],"chunks":[${chunks.mkString(",")}],
       |"dtype":"$dtype","fill_value":$fill,"order":"C","filters":$filters,
       |"dimension_separator":".","compressor":${compressorJson(compressor)}}"""
      .stripMargin.replace("\n", "")
  }

  private def v3TypeName(dtype: String): String = dtype.drop(1) match {
    case "i8" => "int64"
    case "i4" => "int32"
    case "i2" => "int16"
    case "i1" => "int8"
    case "u8" => "uint64"
    case "u4" => "uint32"
    case "u2" => "uint16"
    case "u1" => "uint8"
    case "f8" => "float64"
    case "f4" => "float32"
    case "b1" => "bool"
    case other => throw new IllegalArgumentException(
      s"No Zarr v3 data type for dtype $dtype")
  }

  private def zarrJsonV3(shape: Seq[Long], chunks: Seq[Int], dtypeStr: String,
      typesize: Int, attrsJson: Option[String], shardInner: Int = 0,
      shardCompress: String = "none", compressor: String = "none",
      dimNames: Seq[String] = Nil): String = {
    val attrs = attrsJson.map(a => s""","attributes":$a""").getOrElse("")
    // `dimension_names` is the v3-core (optional) dimension-naming
    // field — xarray reads it, and KerchunkParquetRefs.combineStores
    // uses it to find the concat axis without heuristics
    val dims =
      if (dimNames.isEmpty) ""
      else s""","dimension_names":[${dimNames.map(d => s""""$d"""").mkString(",")}]"""
    val bytesCodec = """{"name":"bytes","configuration":{"endian":"little"}}"""
    def chain(c: String): String = c match {
      case "none" => s"[$bytesCodec]"
      case "zstd" => s"""[$bytesCodec,{"name":"zstd","configuration":{"level":3}}]"""
      case "gzip" => s"""[$bytesCodec,{"name":"gzip","configuration":{"level":5}}]"""
      case "blosc" =>
        s"""[$bytesCodec,{"name":"blosc","configuration":{"cname":"lz4",""" +
          s""""clevel":5,"shuffle":"shuffle","typesize":$typesize}}]"""
      case other => throw new IllegalArgumentException(
        s"Unsupported write compressor: $other")
    }
    val codecs =
      if (shardInner <= 0) chain(compressor)
      else {
        val innerShape = (shardInner +: chunks.drop(1)).mkString(",")
        s"""[{"name":"sharding_indexed","configuration":{
           |"chunk_shape":[$innerShape],
           |"codecs":${chain(shardCompress)},
           |"index_codecs":[$bytesCodec,{"name":"crc32c"}],
           |"index_location":"end"}}]""".stripMargin.replace("\n", "")
      }
    s"""{"zarr_format":3,"node_type":"array","shape":[${shape.mkString(",")}],
       |"data_type":"${v3TypeName(dtypeStr)}",
       |"chunk_grid":{"name":"regular","configuration":{"chunk_shape":[${chunks.mkString(",")}]}},
       |"chunk_key_encoding":{"name":"default","configuration":{"separator":"/"}},
       |"fill_value":0,
       |"codecs":$codecs$dims$attrs}"""
      .stripMargin.replace("\n", "")
  }

  /** Wrap a raw little-endian slab into a v3 shard: body = the inner
    * chunks (contiguous, since inner chunks split only the outer
    * dimension), then the (offset,nbytes) uint64le index + crc32c. */
  private def shardify(slab: Array[Byte], nInner: Int,
      codec: String, typesize: Int): Array[Byte] = {
    val innerBytes = slab.length / nInner
    val body = new java.io.ByteArrayOutputStream()
    val index = ByteBuffer.allocate(nInner * 16).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < nInner) {
      val raw = java.util.Arrays.copyOfRange(slab, i * innerBytes, (i + 1) * innerBytes)
      val enc = compressPayload(raw, codec, typesize)
      index.putLong(body.size().toLong); index.putLong(enc.length.toLong)
      body.write(enc)
      i += 1
    }
    val crc = new java.util.zip.CRC32C
    crc.update(index.array())
    body.write(index.array())
    val tail = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(crc.getValue.toInt)
    body.write(tail.array())
    body.toByteArray
  }

  private def putValue(buf: ByteBuffer, offset: Int, elem: Int, t: DataType, v: Any): Unit =
    t match {
      case LongType => buf.putLong(offset * elem, v.asInstanceOf[Long])
      case IntegerType => buf.putInt(offset * elem, v.asInstanceOf[Int])
      case ShortType => buf.putShort(offset * elem, v.asInstanceOf[Short])
      case ByteType => buf.put(offset * elem, v.asInstanceOf[Byte])
      case DoubleType => buf.putDouble(offset * elem, v.asInstanceOf[Double])
      case FloatType => buf.putFloat(offset * elem, v.asInstanceOf[Float])
      case BooleanType => buf.put(offset * elem, if (v.asInstanceOf[Boolean]) 1.toByte else 0.toByte)
      case TimestampType => buf.putLong(offset * elem, epochMicros(v))
      case StringType =>
        val b = v.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.US_ASCII)
        require(b.length <= elem, s"string '$v' exceeds coordinate width $elem")
        var i = 0
        while (i < elem) { buf.put(offset * elem + i, if (i < b.length) b(i) else 0.toByte); i += 1 }
      case other => throw new IllegalArgumentException(other.toString)
    }

  /** Write `df` as a Zarr v2 store at `path` (created fresh).
    *
    * @param coords coordinate column names, outer dimension first
    * @param chunkOuter chunk extent along the outer dimension
    */
  def write(df: DataFrame, path: String, coords: Seq[String], chunkOuter: Int = 1,
      version: Int = 2, shardInner: Int = 0, shardCompress: String = "none",
      compressor: String = "none", chunkShape: Seq[Int] = Nil,
      deltaFilter: Boolean = false,
      uintColumns: Map[String, Int] = Map.empty,
      maxDimLen: Int = ZarrWriter.defaultMaxDimLen): Unit = {
    require(version == 2 || version == 3, s"zarrVersion must be 2 or 3, got $version")
    require(!deltaFilter || version == 2,
      "deltaFilter requires zarrVersion=2 (numcodecs filters are a v2 concept)")
    require(uintColumns.isEmpty || !deltaFilter,
      "uintColumns cannot combine with deltaFilter (numcodecs delta is declared on the signed dtype)")
    require(shardInner == 0 || compressor == "none",
      "shardInner and compressor are mutually exclusive (use shardCompress for sharded stores)")
    compressorJson(compressor) // validate early
    require(Set("none", "gzip", "zstd", "blosc")(shardCompress),
      s"Unsupported shardCompress codec: $shardCompress (use none, gzip, zstd or blosc)")
    require(coords.nonEmpty, "at least one coordinate column")
    val schema = df.schema
    val varCols = schema.fieldNames.filterNot(coords.contains).toSeq
    require(varCols.nonEmpty, "at least one data-variable column")
    uintColumns.keys.foreach(k => require(varCols.contains(k),
      s"uintColumns names '$k', which is not a data-variable column"))

    // 1. ONE aggregation pass — row count, distinct cells (duplicate
    // guard), per-coordinate distinct/null/NaN counts, AND the sorted
    // coordinate values themselves. Until r16 the coordinate collect
    // was a SECOND action so the max-dimension guard could refuse a
    // pathological dimension before any driver-sized collect; fusing
    // them saves a full re-execution of the (possibly expensive,
    // uncached) input plan per write. The guard survives the fusion
    // because each collected set is CAPPED executor-side with
    // slice(…, 1, maxDimLen): the driver never receives more than
    // maxDimLen values per coordinate, and the uncapped count_distinct
    // in the same row still detects the overflow and refuses. (The
    // trade: executors now build the full distinct set even on a
    // refused input — the guard protects the DRIVER, which is where
    // the coordinate arrays would otherwise materialize unbounded.)
    //
    // Duplicate cells would write nondeterministically (whichever
    // partition's value lands last) and can MASK a missing cell when
    // n still fits the grid — silently replacing user data with fill.
    // A partial grid (missing cells → fill_value) remains legal.
    // Null/NaN coordinates cannot index a grid (NaN breaks ordering and
    // the executor-side cell lookup dies with a bare "key not found").
    val validationAggs: Seq[Column] =
      Seq(count(lit(1)), count_distinct(struct(coords.map(col): _*))) ++
      coords.flatMap { c =>
        val nans = schema(c).dataType match {
          case FloatType | DoubleType => sum(when(isnan(col(c)), 1L).otherwise(0L))
          case _ => lit(0L)
        }
        Seq(count_distinct(col(c)),
          sum(when(col(c).isNull, 1L).otherwise(0L)), nans)
      } ++
      coords.map(c => slice(sort_array(collect_set(col(c))), 1, maxDimLen))
    val v = df.agg(validationAggs.head, validationAggs.tail: _*).head()
    val n = v.getLong(0)
    require(n > 0,
      "cannot write an empty DataFrame as a Zarr store: a grid needs at " +
        "least one value per dimension")
    val nDistinct = v.getLong(1)
    require(nDistinct == n,
      s"input has ${n - nDistinct} duplicate coordinate cell(s): each " +
        s"(${coords.mkString(", ")}) tuple may appear at most once")
    coords.zipWithIndex.foreach { case (name, i) =>
      require(v.getLong(3 + 3 * i) == 0L,
        s"coordinate '$name' contains null — coordinate values must be non-null")
      require(v.getLong(4 + 3 * i) == 0L,
        s"coordinate '$name' contains NaN — grid coordinates must be " +
          "orderable finite values")
      val dimLen = v.getLong(2 + 3 * i)
      // Zarr metadata materializes every coordinate value on the driver
      // (the reference loads all coordinates eagerly at schema inference
      // the same way, /root/reference/src/reader/schema_inference.rs:214-302);
      // grid dimensions are small by construction, so an oversized one is
      // almost always a mis-specified coords list. Refuse loudly here,
      // before the collect, instead of OOMing the driver.
      require(dimLen <= maxDimLen,
        s"coordinate '$name' has $dimLen distinct values, above the " +
          s"maxDimLen bound ($maxDimLen): coordinate arrays are " +
          "driver-materialized Zarr metadata; raise the maxDimLen option " +
          "only if the driver has memory for the full coordinate array")
    }
    // coordinate values from the same fused row (each capped at
    // maxDimLen; the guard above proved dimLen <= maxDimLen, so the
    // capped slice IS the complete sorted dimension)
    val coordVals: Seq[Array[Any]] = coords.indices
      .map(i => v.getSeq[Any](2 + 3 * coords.length + i).toArray)
    val shape = coordVals.map(_.length.toLong)
    val totalRows = shape.product
    require(n <= totalRows,
      s"input has $n rows but the coordinate grid only has $totalRows cells")

    // Effective data-variable chunk shape: explicit `chunkShape` (full
    // N-dim control — at scale inner dims need chunking too, so one
    // chunk targets ~tens of MB, not a whole hyperslab) or the default
    // (chunkOuter, full inner dims) matching the reference fixtures.
    val chunks: Seq[Int] =
      if (chunkShape.nonEmpty) chunkShape else chunkOuter +: shape.drop(1).map(_.toInt)
    require(chunks.length == coords.length,
      s"chunkShape has ${chunks.length} dims but the grid has ${coords.length}")
    require(chunks.forall(_ >= 1), s"chunk extents must be >= 1: $chunks")
    require(chunks.map(_.toLong).product * 8 <= Int.MaxValue,
      s"one chunk (${chunks.mkString("x")}) exceeds the 2 GiB buffer limit")
    val outerChunk = chunks.head
    require(shardInner == 0 || (version == 3 && outerChunk % shardInner == 0),
      s"shardInner requires zarrVersion=3 and outer chunk extent ($outerChunk) divisible by shardInner ($shardInner)")

    // 2. driver writes group + coordinate arrays + variable metadata
    val store = ZarrStore.open(path)
    if (version == 2)
      store.writeBytes(".zgroup", """{"zarr_format":2}""".getBytes)
    else
      store.writeBytes("zarr.json",
        """{"zarr_format":3,"node_type":"group"}""".getBytes)
    // Column metadata (units, long_name, … — e.g. from a zarr read)
    // round-trips as the array's .zattrs (v2) / inline attributes (v3).
    // Every array also records its dimension names (xarray's
    // `_ARRAY_DIMENSIONS` convention): without them, a reader must
    // INFER dimension order by matching sizes to coordinate lengths,
    // which is ambiguous whenever two coordinates share a length (any
    // square grid) — the read-back schema would transpose. Explicit
    // names make write→read round-trips exact for every shape.
    def attrsJson(name: String): Option[String] = {
      val md = schema(name).metadata
      val dims = if (coords.contains(name)) Seq(name) else coords
      val b = new org.apache.spark.sql.types.MetadataBuilder().withMetadata(md)
      b.putStringArray("_ARRAY_DIMENSIONS", dims.toArray)
      Some(b.build().json)
    }
    def writeArrayMeta(name: String, aShape: Seq[Long], aChunks: Seq[Int],
        dtypeStr: String, typesize: Int): Unit = {
      val t = schema(name).dataType
      if (version == 2) {
        store.writeBytes(s"$name/.zarray",
          zarray(aShape, aChunks, dtypeStr, compressor,
            delta = deltaFilter && deltaEligible(t)).getBytes)
        attrsJson(name).foreach(a => store.writeBytes(s"$name/.zattrs", a.getBytes))
      } else {
        // only data variables shard (aShape == full grid shape)
        val si = if (aShape == shape) shardInner else 0
        // dims: a data variable spans the coord order; a coordinate
        // array names its own single dimension
        val dimNames = if (aShape == shape) coords else Seq(name)
        store.writeBytes(s"$name/zarr.json",
          zarrJsonV3(aShape, aChunks, dtypeStr, typesize, attrsJson(name), si,
            shardCompress, compressor, dimNames).getBytes)
      }
    }
    coords.zip(coordVals).foreach { case (name, vals) =>
      val t = schema(name).dataType
      require(version == 2 || (t != StringType && t != TimestampType),
        s"string/datetime coordinate '$name' requires zarrVersion=2 " +
          "(Zarr v3 core has no fixed-width string or datetime64 data type)")
      val (dtypeStr, elem) = coordDtype(t, vals)
      // The OUTER coordinate is chunk-grain at the data variables'
      // outer chunk extent from the FIRST write: appends grow this
      // axis without bound, and a chunk-grain layout lets them extend
      // it by writing only the tail + fresh chunks — never re-chunking
      // chunk 0 in a window racing the metadata flip (the torn-store
      // hazard on the legacy single-chunk layout). Inner coordinates
      // never grow, so they stay a single chunk.
      val cChunk = if (name == coords.head && vals.nonEmpty) outerChunk else vals.length
      writeArrayMeta(name, Seq(vals.length.toLong), Seq(cChunk), dtypeStr, elem)
      val nCC = if (cChunk <= 0) 1 else ((vals.length.toLong + cChunk - 1) / cChunk).toInt
      (0 until math.max(1, nCC)).foreach { cc =>
        val start = cc * cChunk
        val n = math.max(0, math.min(cChunk, vals.length - start))
        // tail cells past the axis length are zero padding — readers
        // truncate at shape (same layout the append path writes)
        val buf = ByteBuffer.allocate(math.max(cChunk, 0) * elem).order(ByteOrder.LITTLE_ENDIAN)
        (0 until n).foreach(i => putValue(buf, i, elem, t, vals(start + i)))
        val payload =
          if (deltaFilter && deltaEligible(t)) deltaEncode(buf.array(), elem) else buf.array()
        store.writeBytes(if (version == 2) s"$name/$cc" else s"$name/c/$cc",
          compressPayload(payload, compressor, elem))
      }
    }
    varCols.foreach { name =>
      val (dtypeStr, elem) = varDtype(name, schema(name).dataType, uintColumns)
      writeArrayMeta(name, shape, chunks, dtypeStr, elem)
    }

    // Consolidated metadata: one-fetch discovery (required for
    // listing-less backends like HTTP). v2 → .zmetadata; v3 → embed
    // under the root zarr.json's `consolidated_metadata`.
    val allNames = coords ++ varCols
    if (version == 2) {
      val entries = allNames.flatMap { n =>
        val za = new String(store.readBytes(s"$n/.zarray").get)
        val attrs = attrsJson(n).map(a => s""""$n/.zattrs": $a""")
        Seq(s""""$n/.zarray": $za""") ++ attrs
      }.mkString(",")
      store.writeBytes(".zmetadata",
        s"""{"zarr_consolidated_format": 1, "metadata": {$entries}}""".getBytes)
    } else {
      val entries = allNames.map { n =>
        val zj = new String(store.readBytes(s"$n/zarr.json").get)
        s""""$n": $zj"""
      }.mkString(",")
      store.writeBytes("zarr.json",
        (s"""{"zarr_format":3,"node_type":"group",""" +
          s""""consolidated_metadata":{"metadata":{$entries}}}""").getBytes)
    }

    // 3. executors write chunk slabs: repartition by outer-chunk id so
    // every chunk (including all inner chunks of an outer slab) lands
    // in exactly one task
    val idxMaps: Seq[Map[Any, Int]] =
      coordVals.map(_.zipWithIndex.toMap)
    val spark = df.sparkSession
    val bIdx = spark.sparkContext.broadcast(idxMaps)
    val varTypes = varCols.map(schema(_).dataType)
    // (element width, unsigned?) per data variable — the serialized
    // layout, which under uintColumns differs from the Spark type's
    val varEnc: Seq[(Int, Boolean)] = varCols.map { n =>
      val (ds, e) = varDtype(n, schema(n).dataType, uintColumns)
      (e, ds.drop(1).startsWith("u"))
    }
    val nOuterChunks = ((shape.head + outerChunk - 1) / outerChunk).toInt

    val outerName = coords.head
    val rows = withChunkId(df, outerName, idxMaps.head, outerChunk)
      .repartition(math.min(nOuterChunks, math.max(1, spark.sparkContext.defaultParallelism)),
        col("__chunk"))

    val coordNames = coords
    val wVersion = version
    val wShardInner = shardInner
    val wShardCompress = shardCompress
    val wStore = store // serializable descriptor; executors open lazily
    val wCompressor = compressor
    val wChunks = chunks
    val wDelta = deltaFilter
    val wVarEnc = varEnc
    def chunkRel(v: Int, ci: Seq[Int]): String =
      if (wVersion == 2) varCols(v) + "/" + ci.mkString(".")
      else (Seq(varCols(v), "c") ++ ci.map(_.toString)).mkString("/")
    // Executors write their chunk slabs and return per-chunk min/max —
    // the driver persists them as `<var>/.zstats` sidecars powering
    // statistics-based chunk pruning (the reference's roadmap
    // "statistics-based chunk pruning" / "data-variable filter
    // pushdown", README.md:289-337; zarr itself has no chunk stats, so
    // this is a sidecar extension readers may ignore).
    // sum kind per var: 1 = exact long accumulation (integrals),
    // 2 = double accumulation (floats), 0 = no sums (timestamp /
    // bool / string — SUM is not meaningful there)
    val varSumKind: Array[Int] = varTypes.map {
      case ByteType | ShortType | IntegerType | LongType => 1
      case FloatType | DoubleType => 2
      case _ => 0
    }.toArray
    val partials: org.apache.spark.rdd.RDD[((Seq[Int], Int), (Double, Double, String))] =
      rows.rdd.mapPartitions { it: Iterator[Row] =>
      val idx = bIdx.value
      val nDims = coordNames.length
      val chunkCells = wChunks.map(_.toLong).product
      val buffers = scala.collection.mutable.Map.empty[(Seq[Int], Int), ByteBuffer]
      val stats = scala.collection.mutable.Map.empty[(Seq[Int], Int), (Double, Double, Long)]
      // per-chunk sum partials: (longSum, doubleSum, poisoned) —
      // poisoned on long overflow or non-finite doubles; a poisoned
      // chunk drops the WHOLE variable's sums (the sidecar must stay
      // all-or-nothing for the complete-coverage attestation)
      val sums = scala.collection.mutable.Map.empty[(Seq[Int], Int), (Long, Double, Boolean)]
      def trackStat(ci: Seq[Int], v: Int, value: Any): Unit = {
        val d = value match {
          case n: java.lang.Number => n.doubleValue()
          case b: Boolean => if (b) 1.0 else 0.0
          // datetime values decode to epoch micros, so stats (and the
          // pruning comparisons) live in micro space too
          case t: java.sql.Timestamp => epochMicros(t).toDouble
          case i: java.time.Instant => epochMicros(i).toDouble
          case _ => return
        }
        val cur = stats.getOrElse((ci, v), (d, d, 0L))
        stats((ci, v)) = (math.min(cur._1, d), math.max(cur._2, d), cur._3 + 1)
        varSumKind(v) match {
          case 1 =>
            val (sl, sd, bad) = sums.getOrElse((ci, v), (0L, 0.0, false))
            val next =
              try (Math.addExact(sl, value.asInstanceOf[java.lang.Number].longValue()), sd, bad)
              catch { case _: ArithmeticException => (sl, sd, true) }
            sums((ci, v)) = next
          case 2 =>
            val (sl, sd, bad) = sums.getOrElse((ci, v), (0L, 0.0, false))
            val nd = sd + d
            sums((ci, v)) = (sl, nd, bad || !java.lang.Double.isFinite(nd))
          case _ =>
        }
      }
      def bufFor(ci: Seq[Int], v: Int): ByteBuffer =
        buffers.getOrElseUpdate((ci, v), {
          // Zarr v2 edge chunks are stored at FULL chunk shape (the
          // overhang is fill padding) — readers size buffers from the
          // chunk shape, not the array shape
          val (elem, _) = wVarEnc(v)
          ByteBuffer.allocate(chunkCells.toInt * elem)
            .order(ByteOrder.LITTLE_ENDIAN)
        })
      it.foreach { row =>
        // grid indices → (chunk index vector, C-order offset in chunk)
        val ci = new Array[Int](nDims)
        var local = 0L
        var d = 0
        while (d < nDims) {
          val gi = idx(d)(row.getAs[Any](coordNames(d)))
          ci(d) = gi / wChunks(d)
          local = local * wChunks(d) + (gi % wChunks(d))
          d += 1
        }
        val key = ci.toSeq
        var v = 0
        while (v < varCols.length) {
          val (elem, isU) = wVarEnc(v)
          val value = row.getAs[Any](varCols(v))
          if (isU) putUint(bufFor(key, v), local.toInt, elem, value)
          else putValue(bufFor(key, v), local.toInt, elem, varTypes(v), value)
          trackStat(key, v, value)
          v += 1
        }
      }
      buffers.toSeq.map { case ((ci, v), buf) =>
        val (elem, _) = wVarEnc(v)
        val payload =
          if (wShardInner > 0)
            shardify(buf.array(), wChunks.head / wShardInner, wShardCompress, elem)
          else {
            val t = varTypes(v)
            val raw =
              if (wDelta && deltaEligible(t)) deltaEncode(buf.array(), elem) else buf.array()
            compressPayload(raw, wCompressor, elem)
          }
        wStore.writeBytes(chunkRel(v, ci), payload)
        // widen by fill_value (0) ONLY for partially-filled chunks —
        // their unwritten cells hold fill, so stats must cover it;
        // fully-covered chunks keep their tight range
        val (mn0, mx0, cnt) = stats.getOrElse((ci, v), (0.0, 0.0, 0L))
        val (mn, mx) =
          if (cnt >= chunkCells) (mn0, mx0)
          else (math.min(mn0, 0.0), math.max(mx0, 0.0))
        // sum partial as a JSON fragment [sum, written-count]; null
        // when the variable carries no sums or this chunk poisoned
        val sumJson = sums.get((ci, v)) match {
          case Some((sl, _, false)) if varSumKind(v) == 1 => s"[$sl, $cnt]"
          case Some((_, sd, false)) if varSumKind(v) == 2 => s"[$sd, $cnt]"
          case _ => null
        }
        ((ci, v), (mn, mx, sumJson))
      }.iterator
    }

    // EXECUTORS assemble and write the stats sidecars (one JSON per
    // variable): the per-chunk partials shuffle to one assembly task
    // per variable (same single job — the shuffle boundary guarantees
    // every chunk slab is written before assembly starts), each task
    // sorts its entries into canonical C-order and writes
    // `<var>/.zstats` through the store, and the driver receives ONE
    // summary row per variable. Until round 13 the driver collect()'ed
    // every (chunk, var) partial before writing sidecars — metadata-
    // sized, but a driver-memory hotspot at 10^7 chunks × many
    // variables. Sums (+ the complete-coverage attestation) only when
    // EVERY written chunk produced a sum partial — chunks with no
    // entry are then provably all-fill, so readers can answer SUM/AVG
    // from the sidecar alone (chunk-level aggregate pushdown).
    val wVarSumKind = varSumKind
    val summaries = partials
      .map { case ((ci, v), t) => (v, (ci, t)) }
      .partitionBy(new VarPartitioner(math.max(1, varCols.length)))
      .mapPartitionsWithIndex { (v, it) =>
        if (v >= varCols.length) { require(it.isEmpty); Iterator.empty }
        else {
          import scala.math.Ordering.Implicits._
          val mine = it.map(_._2).toVector.sortBy(_._1)
          def keyOf(ci: Seq[Int]): String =
            if (wVersion == 2) ci.mkString(".")
            else ("c" +: ci.map(_.toString)).mkString("/")
          val entries = mine.map { case (ci, (mn, mx, _)) =>
            s""""${keyOf(ci)}": [$mn, $mx]"""
          }.mkString(",")
          val sumsOk = wVarSumKind(v) != 0 && mine.nonEmpty && mine.forall(_._2._3 != null)
          val sumsJson =
            if (!sumsOk) ""
            else {
              // the "total" record answers ungrouped SUM/AVG in O(1) —
              // a fleet-scale variable has millions of chunk entries
              // the reader must not need to fold
              val sumParts = mine.map(_._2._3).map(parseSumJson)
              val total = sumParts.foldLeft((java.math.BigDecimal.ZERO, 0L)) {
                case ((s, c), (s2, c2)) => (s.add(s2), c + c2)
              }
              mine.map { case (ci, (_, _, sj)) => s""""${keyOf(ci)}": $sj""" }
                .mkString(""", "sums": {""", ",",
                  s"""}, "total": [${total._1.toPlainString}, ${total._2}], "complete": true""")
            }
          wStore.writeBytes(s"${varCols(v)}/.zstats",
            s"""{"chunks": {$entries}$sumsJson}""".getBytes)
          Iterator.single(v -> mine.size)
        }
      }.collect()
    lastStatsDriverRows = summaries.length
    // a rewrite at this path must not serve chunks cached before it
    ChunkIO.invalidatePath(store.path)
  }

  /** Attach the outer-chunk id via a BROADCAST equi-join against the
    * (value → chunk) table. A chained CASE per outer value would
    * build an expression tree as deep as the outer extent — a 50k-step
    * time dimension then stack-overflows the analyzer and busts the
    * codegen method limit; the join is O(1) expression depth at any
    * extent. */
  private def withChunkId(df: DataFrame, outer: String,
      idx: Map[Any, Int], chunkOuter: Int): DataFrame = {
    val spark = df.sparkSession
    val rows = idx.toSeq.map { case (v, i) =>
      org.apache.spark.sql.Row(v, (i / chunkOuter).toLong)
    }
    val mapDf = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("__ov", df.schema(outer).dataType, nullable = false),
        StructField("__chunk", LongType, nullable = false))))
    df.join(broadcast(mapDf), df(outer) === mapDf("__ov")).drop("__ov")
  }

  /** Row-domain value → the coordinate raw domain ([[ChunkCodec
    * .elementAt]]): timestamps become epoch micros, everything else is
    * already the typed value. */
  private def rawOf(v: Any): Any = v match {
    case t: java.sql.Timestamp => epochMicros(t)
    case i: java.time.Instant => epochMicros(i)
    case other => other
  }

  /** Serialize one raw-domain value at `offset` (little-endian). */
  private def putRaw(buf: ByteBuffer, offset: Int, dtype: ZarrDType, v: Any): Unit = {
    val elem = dtype.size
    (dtype.kind, dtype.size) match {
      case ('i', 8) | ('M', _) => buf.putLong(offset * elem, v.asInstanceOf[Long])
      case ('i', 4) => buf.putInt(offset * elem, v.asInstanceOf[Int])
      case ('i', 2) => buf.putShort(offset * elem, v.asInstanceOf[Short])
      case ('i', 1) => buf.put(offset * elem, v.asInstanceOf[Byte])
      case ('u', w) => putUint(buf, offset, w, v)
      case ('f', 8) => buf.putDouble(offset * elem, v.asInstanceOf[Double])
      case ('f', 4) => buf.putFloat(offset * elem, v.asInstanceOf[Float])
      case ('b', _) => buf.put(offset * elem, if (v.asInstanceOf[Boolean]) 1.toByte else 0.toByte)
      case other => throw new UnsupportedOperationException(
        s"append cannot serialize coordinate dtype $other")
    }
  }

  /** Back-map a store's parsed compressor to this writer's codec name;
    * refuses combinations the writer cannot reproduce. */
  private def codecNameOf(c: ZarrCompressor, what: String): String = c.id match {
    case "none" | "zstd" | "gzip" | "zlib" => c.id
    case "blosc" if c.cname == "lz4" || c.cname.isEmpty => "blosc"
    case other => throw new UnsupportedOperationException(
      s"append cannot re-encode $what compressed with '$other" +
        (if (c.cname.nonEmpty) s"/${c.cname}" else "") + "'")
  }

  /** Edit the outer extent of an array's metadata document in place
    * (v2 `.zarray` or v3 `zarr.json`) — everything else (attributes,
    * fill_value, codecs, filters) is preserved verbatim. */
  private def editShape(store: ZarrStore, rel: String, newOuter: Long,
      newOuterChunks: Option[Int]): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(store.readBytes(rel).getOrElse(
      throw new IllegalStateException(s"missing metadata document $rel")))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    node.withArray("shape").set(0,
      com.fasterxml.jackson.databind.node.LongNode.valueOf(newOuter))
    newOuterChunks.foreach { c =>
      if (node.has("chunks")) // v2
        node.withArray("chunks").set(0,
          com.fasterxml.jackson.databind.node.IntNode.valueOf(c))
      else // v3 regular chunk grid
        node.get("chunk_grid").get("configuration")
          .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          .withArray("chunk_shape").set(0,
            com.fasterxml.jackson.databind.node.IntNode.valueOf(c))
    }
    store.writeBytes(rel, mapper.writeValueAsBytes(node))
  }

  /** Append new OUTER-dimension slabs to an existing store: the
    * time-series ingest path (each batch adds whole outer chunks; no
    * existing chunk object is rewritten). Requirements, all enforced
    * loudly: the existing outer extent is a multiple of the outer
    * chunk extent (new chunks start on a boundary), new outer values
    * sort strictly after the existing ones, inner coordinates match
    * the store exactly, and the store is unsharded with a codec this
    * writer can produce. Metadata documents are edited in place
    * (shape only), so attributes/fill/codecs survive verbatim; the
    * outer coordinate array is (re)written chunk-grain at the data
    * variables' outer chunk extent — the fresh-write path already
    * emits that layout, so steady state touches only the new chunks.
    * Chunk data at indices the old metadata never addressed lands
    * before any metadata change, so a crash leaves the store readable
    * at its OLD shape plus unreferenced chunk objects — never a torn
    * grid. On the one-time re-chunk of a legacy single-chunk
    * coordinate, the colliding chunk files are rewritten only AFTER
    * the metadata flip, where the old whole-axis file reads as an
    * oversized chunk the decoders truncate to the correct prefix —
    * both crash windows stay readable. (Concurrent reads during
    * append see either the old or the new shape, like any metadata
    * swap.) */
  def append(df: DataFrame, path: String): Unit = {
    val store = ZarrStore.open(path)
    // Single-writer lock: two concurrent appenders would interleave the
    // in-place shape edit (both read extent N, both write N+k — one
    // batch's rows silently vanish from the metadata). Exactly one
    // caller wins the atomic lock-file create; the loser fails loudly
    // and can retry after the winner releases.
    //
    // LEASE semantics: the holder re-writes the lock object every
    // [[leaseHeartbeatMillis]] (atomic per-object write), so a lock
    // whose heartbeat is older than [[leaseTtlMillis]] marks a CRASHED
    // holder — a new appender breaks it and proceeds (self-healing; no
    // operator hand-delete on fleets). The break double-reads the lock
    // and only deletes if the observed stale content is unchanged, so
    // a racing breaker that already re-acquired is never clobbered
    // (the window between re-read and delete remains — same
    // best-effort caveat as createExclusive on object stores without
    // conditional ops; local/HDFS narrow it to single-request size).
    // A lock with an UNPARSEABLE heartbeat is never broken — loud
    // manual recovery beats deleting a lock we don't understand.
    def lockBytes(): Array[Byte] =
      (s"${java.lang.management.ManagementFactory.getRuntimeMXBean.getName}\n" +
        s"started ${java.time.Instant.now()}\n" +
        s"heartbeat ${System.currentTimeMillis()}").getBytes("UTF-8")
    def heartbeatOf(bytes: Array[Byte]): Option[Long] =
      new String(bytes, "UTF-8").linesIterator
        .find(_.startsWith("heartbeat "))
        .flatMap(_.stripPrefix("heartbeat ").toLongOption)
    var acquired = store.createExclusive(appendLockRel, lockBytes())
    if (!acquired) {
      val observed = store.readBytes(appendLockRel)
      val stale = observed.exists(b => heartbeatOf(b)
        .exists(hb => System.currentTimeMillis() - hb > leaseTtlMillis))
      if (stale) {
        val again = store.readBytes(appendLockRel)
        if (again.map(_.toSeq) == observed.map(_.toSeq)) {
          store.deleteObject(appendLockRel)
          acquired = store.createExclusive(appendLockRel, lockBytes())
        }
      }
    }
    if (!acquired) {
      val holder = store.readBytes(appendLockRel)
        .map(new String(_, "UTF-8").replace('\n', ' ')).getOrElse("(already released)")
      throw new IllegalStateException(
        s"another append holds the writer lock on $path [$holder] — " +
          s"appends are single-writer; retry after it finishes (a crashed " +
          s"holder's lock self-expires ${leaseTtlMillis / 1000}s after its " +
          s"last heartbeat)")
    }
    // holder heartbeat: keeps the lease alive for appends longer than
    // the TTL; daemon so a crashed/killed JVM stops heartbeating and
    // the lease expires
    val leaseToken = new Object
    leaseTimelineTestHook(leaseToken, "acquire")
    @volatile var done = false
    val beat = new Thread(() => {
      try {
        while (!done) {
          Thread.sleep(leaseHeartbeatMillis)
          if (!done) {
            leaseBeatTestHook()
            leaseTimelineTestHook(leaseToken, "beat")
            try store.writeBytes(appendLockRel, lockBytes())
            catch { case _: Exception => () } // store gone/read-only: next acquire surfaces it
            // Deliberately NO delete-if-done here: the release path
            // joins this thread before ITS deleteObject, which already
            // serializes any in-flight write above with the delete. A
            // beat-side delete would race release's unconditional
            // delete — beat deletes, a competing appender acquires in
            // the gap, release's delete then clobbers the NEW holder's
            // lock and a third appender can acquire mid-append — the
            // exact double-writer corruption the lock exists to
            // prevent. One owner of the delete: the release path,
            // after the join.
          }
        }
      } catch { case _: InterruptedException => () } // release path
    }, "graft-append-lease")
    beat.setDaemon(true)
    beat.start()
    try appendLocked(df, path, store)
    finally {
      done = true
      beat.interrupt()
      // Serialize with any in-flight heartbeat write BEFORE deleting the
      // lock. The beat loop's `!done` check and its write are not atomic,
      // interrupt is swallowed around the write, and file IO does not
      // reliably abort on interrupt — without this join a heartbeat write
      // can land AFTER deleteObject, leaving an orphaned lock with a
      // fresh heartbeat that blocks the next appender for a full TTL
      // (caught live by ZarrAppendSpec in round 11). The join must be
      // unbounded (a bounded join reopens the resurrection race), but
      // an unbounded SILENT join turns a wedged heartbeat write (hung
      // network filesystem) into an undiagnosable hang — so wait in
      // TTL-sized slices and log progress, keeping the wedge observable
      // without ever deleting the lock before the write has settled.
      var waitedMs = 0L
      beat.join(leaseTtlMillis)
      while (beat.isAlive) {
        waitedMs += leaseTtlMillis
        System.err.println(s"[graft] append lease release on $path: " +
          s"heartbeat write still in flight after ${waitedMs}ms — " +
          "waiting for the store write to settle (wedged filesystem?)")
        beat.join(leaseTtlMillis)
      }
      leaseTimelineTestHook(leaseToken, "release")
      store.deleteObject(appendLockRel)
    }
  }

  /** Test seam, invoked on the heartbeat thread between the `!done`
    * liveness check and the lock re-write. Lets a spec hold a heartbeat
    * write in flight across release DETERMINISTICALLY (latches, not a
    * timing lottery) to pin the release/heartbeat serialization above.
    * No-op in production. */
  @volatile private[graft] var leaseBeatTestHook: () => Unit = () => ()

  /** Timing seam for the fuzz harness's JVM-pause detector: invoked
    * with a per-append token at lock ACQUISITION (the instant the
    * lease clock starts), on every heartbeat, and on the RELEASE path
    * after the final heartbeat settles (just before the lock delete).
    * Keying gaps by token — not by thread, not from race start —
    * closes both detector blind spots from the r13 ADVICE: pre-
    * acquisition scheduling delay is no longer counted (the thread
    * holds nothing yet), and a pause landing after the holder's last
    * heartbeat is still measured. No-op in production. */
  @volatile private[graft] var leaseTimelineTestHook: (AnyRef, String) => Unit =
    (_, _) => ()

  /** Store-relative lock object taken for the duration of an append. */
  val appendLockRel = ".graft_append.lock"

  /** key = variable index → partition = that index: routes every
    * chunk's stat partial to the one executor task that assembles and
    * writes that variable's `.zstats` sidecar. */
  private final class VarPartitioner(n: Int) extends org.apache.spark.Partitioner {
    override def numPartitions: Int = n
    override def getPartition(key: Any): Int = key.asInstanceOf[Int]
  }

  /** Test seam: how many rows the last sidecar-assembly job returned
    * to the driver. The round-13 distribution contract — pinned by
    * ZarrWriterSpec at 10^4 chunks — is that this is the VARIABLE
    * count (one summary row each), never the per-chunk partial count
    * the pre-round-13 driver collect() materialized. */
  @volatile private[graft] var lastStatsDriverRows: Int = -1

  /** Largest single driver-side buffer the last append's outer-
    * coordinate rewrite allocated, in bytes — a ZarrWriterSpec hook
    * asserting the rewrite stays chunk-grain (one outer chunk, never
    * the whole grown coordinate). */
  @volatile private[graft] var lastCoordRewriteMaxAllocBytes: Long = -1L

  /** Test seam for the coordinate-rewrite crash windows: invoked with
    * "preflip" once every never-before-addressed coordinate chunk has
    * landed (metadata still OLD — a crash/reader here must see the
    * store at its old shape) and "postflip" right after the shape
    * edits, BEFORE any colliding legacy chunk file is overwritten (a
    * reader here must see the new shape with the legacy file
    * tolerated as an oversized chunk). Lets ZarrWriterSpec read the
    * store AT those instants instead of a timing lottery. No-op in
    * production. */
  @volatile private[graft] var coordRewriteTestHook: String => Unit = _ => ()

  /** Numeric C-order sort key for a chunk-key STRING ("10.0" v2,
    * "c/10/0" v3): append-merged sidecar entries must sort by parsed
    * chunk indices like the fresh-write path sorts its Seq[Int] keys,
    * or a write-then-append store is never byte-identical to the
    * equivalent fresh write (string sort puts "10.0" before "2.0" —
    * r13 ADVICE canonical-bytes fix). */
  private def chunkKeyOrder(k: String): Seq[Int] =
    k.split("[./]").toSeq.filter(s => s.nonEmpty && s.forall(_.isDigit)).map(_.toInt)

  /** Lease TTL: a lock whose last heartbeat is older than this is a
    * crashed holder and may be broken. Var (not val) so tests can
    * shrink the clock; production default trades prompt self-healing
    * against GC-pause false positives (a 60s pause losing the lease is
    * the same calculus as ZK/etcd session timeouts). */
  @volatile private[graft] var leaseTtlMillis: Long = 60000L

  /** Holder heartbeat interval — far under the TTL so several beats
    * can be missed before the lease is breakable. */
  @volatile private[graft] var leaseHeartbeatMillis: Long = 5000L

  private def appendLocked(df: DataFrame, path: String, store: ZarrStore): Unit = {
    val meta0 = ZarrMeta.readStore(path)
    require(meta0.dataVars.forall(_.sharding.isEmpty),
      "append to sharded stores is not supported")
    val coordNames = meta0.coordNames
    val varNames = meta0.dataVars.map(_.name)
    val schema = df.schema
    require(schema.fieldNames.toSet == (coordNames ++ varNames).toSet,
      s"append input columns ${schema.fieldNames.mkString(",")} must be exactly " +
        s"the store's columns ${(coordNames ++ varNames).mkString(",")}")
    (meta0.coords.map(c => c.meta.name -> c.meta.dtype.sparkType) ++
      meta0.dataVars.map(v => v.name -> v.dtype.sparkType)).foreach { case (n, t) =>
      require(schema(n).dataType == t,
        s"append column $n has type ${schema(n).dataType}, store expects $t")
    }

    val outer = meta0.coords.head
    val outerName = outer.meta.name
    require("iuM".contains(outer.meta.dtype.kind) || outer.meta.dtype.kind == 'f',
      s"append outer coordinate must be numeric or datetime, got dtype ${outer.meta.dtype}")
    val outerChunk = meta0.dataVars.head.chunks.head
    require(meta0.dataVars.forall(_.chunks == meta0.dataVars.head.chunks),
      "append requires all data variables to share one chunk shape")
    require(outer.length % outerChunk == 0,
      s"existing outer extent ${outer.length} is not a multiple of the outer chunk " +
        s"extent $outerChunk — append would straddle a chunk; rewrite the store instead")
    meta0.dataVars.foreach(v => codecNameOf(v.compressor, v.name)) // validate early

    // same duplicate-cell guard as the full write, fused with the new
    // outer-coordinate collection into ONE action (the former three —
    // count, distinct-cells count, outer distinct collect — each
    // re-executed an uncached input plan). The outer dimension grows
    // without bound across appends, but each BATCH's new outer values
    // are batch-sized; the full-write maxDimLen guard still bounds the
    // per-batch driver collect.
    val appendAggs: Seq[Column] =
      Seq(count(lit(1)),
        count_distinct(struct(coordNames.map(col): _*)),
        sum(when(col(outerName).isNull, 1L).otherwise(0L))) ++
      coordNames.map(c => sort_array(collect_set(col(c))))
    val aRow = df.agg(appendAggs.head, appendAggs.tail: _*).head()
    val nRows = aRow.getLong(0)
    require(nRows > 0, "append input has no rows")
    val nCells = aRow.getLong(1)
    require(nCells == nRows,
      s"append input has ${nRows - nCells} duplicate coordinate cell(s): each " +
        s"(${coordNames.mkString(", ")}) tuple may appear at most once")
    // collect_set silently drops nulls, so refuse them explicitly — a
    // null outer value can never index the grid
    require(aRow.getLong(2) == 0L,
      s"append outer coordinate '$outerName' contains null")

    // new outer values: distinct, sorted, strictly after the existing max
    val newOuterVals: Array[Any] = aRow.getSeq[Any](3).toArray
    require(newOuterVals.length <= ZarrWriter.defaultMaxDimLen,
      s"append batch adds ${newOuterVals.length} outer values, above the " +
        s"per-batch driver bound (${ZarrWriter.defaultMaxDimLen})")
    val existingMax = outer.doubles.max
    val newMins = newOuterVals.map {
      case t: java.sql.Timestamp => epochMicros(t).toDouble
      case i: java.time.Instant => epochMicros(i).toDouble
      case n: java.lang.Number => n.doubleValue()
      case other => throw new UnsupportedOperationException(
        s"append outer value $other is not numeric/datetime")
    }
    require(newMins.head > existingMax,
      s"append outer values must sort strictly after the existing maximum " +
        s"($existingMax); got ${newMins.head}")

    // inner coordinates must match the store exactly (values come from
    // the same fused aggregation — collect_set drops nulls, but a null
    // makes the sets differ from the null-free store, which fails here)
    meta0.coords.tail.zipWithIndex.foreach { case (c, i) =>
      val dfVals = aRow.getSeq[Any](4 + i).map(rawOf).toSeq
      val stored = (0 until c.length).map(j => ChunkCodec.elementAt(c.raw, j))
      require(dfVals == stored,
        s"append inner coordinate ${c.meta.name} does not match the store " +
          s"(got ${dfVals.take(5)}…, store has ${stored.take(5)}…)")
    }

    val oldLen = outer.length
    // global grid index per dimension, raw-domain keys
    val outerIdx: Map[Any, Int] =
      newOuterVals.zipWithIndex.map { case (v, i) => (v, oldLen + i) }.toMap
    val innerIdx: Seq[Map[Any, Int]] = meta0.coords.tail.map { c =>
      (0 until c.length).map(i => ChunkCodec.elementAt(c.raw, i) -> i).toMap
    }

    val spark = df.sparkSession
    val bInner = spark.sparkContext.broadcast(innerIdx)
    val varMetas = meta0.dataVars
    val nNewOuterChunks = (newOuterVals.length + outerChunk - 1) / outerChunk
    val rows = withChunkId(df, outerName, outerIdx, outerChunk)
      .repartition(math.min(nNewOuterChunks,
        math.max(1, spark.sparkContext.defaultParallelism)), col("__chunk"))

    val wStore = store
    val coordNamesL = coordNames
    // same sum-kind classification as the full write path (the merged
    // sidecar must stay exact across appends)
    val appendSumKind: Array[Int] = varMetas.map(_.dtype.sparkType match {
      case ByteType | ShortType | IntegerType | LongType => 1
      case FloatType | DoubleType => 2
      case _ => 0
    }).toArray
    val partialsRdd: org.apache.spark.rdd.RDD[((Seq[Long], Int), (Double, Double, String))] =
      rows.rdd.mapPartitions { (it: Iterator[Row]) =>
        val inner = bInner.value
        val nDims = coordNamesL.length
        val buffers = scala.collection.mutable.Map.empty[(Seq[Long], Int), ByteBuffer]
        val stats = scala.collection.mutable.Map.empty[(Seq[Long], Int), (Double, Double, Long)]
        val sums = scala.collection.mutable.Map.empty[(Seq[Long], Int), (Long, Double, Boolean)]
        def trackStat(ci: Seq[Long], v: Int, value: Any): Unit = {
          val d = value match {
            case n: java.lang.Number => n.doubleValue()
            case b: Boolean => if (b) 1.0 else 0.0
            case t: java.sql.Timestamp => epochMicros(t).toDouble
            case i: java.time.Instant => epochMicros(i).toDouble
            case _ => return
          }
          val cur = stats.getOrElse((ci, v), (d, d, 0L))
          stats((ci, v)) = (math.min(cur._1, d), math.max(cur._2, d), cur._3 + 1)
          appendSumKind(v) match {
            case 1 =>
              val (sl, sd, bad) = sums.getOrElse((ci, v), (0L, 0.0, false))
              val next =
                try (Math.addExact(sl, value.asInstanceOf[java.lang.Number].longValue()), sd, bad)
                catch { case _: ArithmeticException => (sl, sd, true) }
              sums((ci, v)) = next
            case 2 =>
              val (sl, sd, bad) = sums.getOrElse((ci, v), (0L, 0.0, false))
              val nd = sd + d
              sums((ci, v)) = (sl, nd, bad || !java.lang.Double.isFinite(nd))
            case _ =>
          }
        }
        it.foreach { row =>
          val ci = new Array[Long](nDims)
          var local = 0L
          var d = 0
          var gi = 0
          while (d < nDims) {
            val m = varMetas.head.chunks(d)
            gi =
              if (d == 0) outerIdx(row.getAs[Any](coordNamesL(0)))
              else inner(d - 1)(rawOf(row.getAs[Any](coordNamesL(d))))
            ci(d) = gi / m
            local = local * m + (gi % m)
            d += 1
          }
          val key = ci.toSeq
          var v = 0
          while (v < varMetas.length) {
            val m = varMetas(v)
            val buf = buffers.getOrElseUpdate((key, v),
              ByteBuffer.allocate(m.chunks.product * m.dtype.size)
                .order(ByteOrder.LITTLE_ENDIAN))
            val value = row.getAs[Any](m.name)
            // unsigned dtypes carry a WIDENED Spark type (u4 → Long):
            // serialize by the store dtype's width, never the Spark
            // type's, or an 8-byte put at a 4-byte stride corrupts
            // neighboring cells
            if (m.dtype.kind == 'u') putUint(buf, local.toInt, m.dtype.size, value)
            else putValue(buf, local.toInt, m.dtype.size, m.dtype.sparkType, value)
            trackStat(key, v, value)
            v += 1
          }
        }
        buffers.toSeq.map { case ((ci, v), buf) =>
          val m = varMetas(v)
          val raw =
            if (m.deltaFilter) deltaEncode(buf.array(), m.dtype.size) else buf.array()
          val payload = compressPayload(raw, codecNameOf(m.compressor, m.name), m.dtype.size)
          wStore.writeBytes(s"${m.name}/${m.chunkKey(ci)}", payload)
          val chunkCells = m.chunks.map(_.toLong).product
          val (mn0, mx0, cnt) = stats.getOrElse((ci, v), (0.0, 0.0, 0L))
          val fv = m.fillValue
          val (mn, mx) =
            if (cnt >= chunkCells) (mn0, mx0)
            else if (java.lang.Double.isFinite(fv)) (math.min(mn0, fv), math.max(mx0, fv))
            else (Double.NaN, Double.NaN) // partial + non-finite fill: no stats entry
          val sumJson = sums.get((ci, v)) match {
            case Some((sl, _, false)) if appendSumKind(v) == 1 => s"[$sl, $cnt]"
            case Some((_, sd, false)) if appendSumKind(v) == 2 => s"[$sd, $cnt]"
            case _ => null
          }
          ((ci, v), (mn, mx, sumJson))
        }.iterator
      }
    // Materialize the chunk-slab writes NOW, keyed and pre-shuffled to
    // one partition per variable and CACHED post-shuffle: the
    // coordinate/shape edits below must only happen once every slab is
    // durably written, while the sidecar MERGE (step 3) must happen
    // AFTER the shape edits — so the partials are staged through a
    // persisted RDD instead of a driver collect() (the driver never
    // materializes the per-chunk partial set; at 10^7 chunks × many
    // variables that collect was a driver-memory hotspot).
    // localCheckpoint TRUNCATES LINEAGE, not just caches (r13 ADVICE):
    // computing partialsRdd performs the chunk-slab writes as a side
    // effect, and a lost cached partition after the coordinate/shape
    // edits below would otherwise lineage-recompute — re-executing
    // slab writes mid-append. The slab bytes are independent of the
    // edited metadata, so a re-execution happens to be idempotent, but
    // the invariant is implicit; with a truncated lineage a lost
    // partition fails the job loudly instead (metadata-sized data, one
    // partition per variable — losing it means the JVM died anyway).
    val keyedPartials = partialsRdd
      .map { case ((ci, v), t) => (v, (ci, t)) }
      .partitionBy(new VarPartitioner(math.max(1, varMetas.length)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    keyedPartials.localCheckpoint()
    keyedPartials.count()

    // 1) rewrite the outer coordinate in CHUNK-GRAIN pieces at the
    // data variables' outer chunk extent — never as one newLen-sized
    // driver ByteBuffer (the 10⁹-step-axis watch item: the coordinate
    // grows without bound across appends, so the rewrite must not).
    // Steady state (coord already chunked at outerChunk — every store
    // this writer's fresh path produces since the chunk-grain fresh
    // layout landed): old chunks are FULL (oldLen % outerChunk == 0,
    // guarded above) and untouched; only the chunks covering
    // [oldLen, newLen) are written. A coordinate chunked any other
    // way — pre-chunk-grain fresh writes and external stores carry a
    // single-chunk layout — is re-chunked once, still one
    // outerChunk-sized buffer at a time, in a CRASH-SAFE order: fresh
    // indices land here (invisible to old-metadata readers), the
    // colliding legacy prefix only after the metadata flip (step 2.5);
    // chunk files beyond the new grid (a finer legacy chunking)
    // become orphans the reader never addresses. Tail-chunk cells
    // past newLen are zero padding — readers truncate at shape.
    val newLen = oldLen + newOuterVals.length
    val cmeta = outer.meta
    def outerRawAt(i: Int): Any =
      if (i < oldLen) ChunkCodec.elementAt(outer.raw, i)
      else rawOf(newOuterVals(i - oldLen))
    val rechunkCoord = cmeta.chunks.head != outerChunk
    val firstCoordChunk = if (rechunkCoord) 0 else (oldLen / outerChunk)
    val nCoordChunks = ((newLen.toLong + outerChunk - 1) / outerChunk).toInt
    // Chunk indices a reader of the OLD metadata already addresses
    // (the legacy layout's chunk-file names). Overwriting one of them
    // BEFORE the metadata flip would tear a crashed/concurrent
    // old-shape read — the pre-flip loop below writes only fresh
    // (never-addressed) indices, and the colliding prefix is deferred
    // to AFTER the flip (step 2.5), where the old single-chunk file is
    // merely OVERSIZED under the new chunk grid and the decoders
    // truncate it to the correct prefix.
    val nLegacyCoordChunks =
      if (rechunkCoord) ((oldLen.toLong + cmeta.chunks.head - 1) / cmeta.chunks.head).toInt
      else 0
    lastCoordRewriteMaxAllocBytes = outerChunk.toLong * cmeta.dtype.size
    def writeCoordChunk(cc: Int): Unit = {
      val start = cc * outerChunk
      val n = math.min(outerChunk, newLen - start)
      val cbuf = ByteBuffer.allocate(outerChunk * cmeta.dtype.size)
        .order(ByteOrder.LITTLE_ENDIAN)
      (0 until n).foreach(i => putRaw(cbuf, i, cmeta.dtype, outerRawAt(start + i)))
      val craw = if (cmeta.deltaFilter) deltaEncode(cbuf.array(), cmeta.dtype.size)
        else cbuf.array()
      store.writeBytes(s"$outerName/${cmeta.chunkKey(Seq(cc.toLong))}",
        compressPayload(craw, codecNameOf(cmeta.compressor, outerName), cmeta.dtype.size))
    }
    (firstCoordChunk until nCoordChunks)
      .filter(cc => cc >= nLegacyCoordChunks)
      .foreach(writeCoordChunk)
    coordRewriteTestHook("preflip")

    // 1.5) REVOKE the sum attestation before the shape grows: a reader
    // landing between the shape edit and the final sidecar rewrite
    // would otherwise see the NEW extent with the OLD sums still
    // marked "complete" and answer SUM with the appended slab valued
    // as fill — silently wrong. Min/max entries are fail-safe at any
    // time (absent chunks are never pruned), so only sums must drop;
    // a crash here leaves pushdown disabled until the next successful
    // write, which is safe.
    varMetas.foreach { m =>
      if (m.sumsComplete && m.chunkStats.nonEmpty) {
        val entries = m.chunkStats
          .map { case (k, (mn, mx)) => s""""$k": [$mn, $mx]""" }.mkString(",")
        store.writeBytes(s"${m.name}/.zstats", s"""{"chunks": {$entries}}""".getBytes)
      }
    }

    // 2) metadata shape edits (coordinate first: a reader racing the
    // append must never see variables longer than their dimensions)
    val metaRel = (n: String) => if (meta0.coords.head.meta.isV3) s"$n/zarr.json" else s"$n/.zarray"
    editShape(store, metaRel(outerName), newLen, Some(outerChunk))
    varNames.foreach(n => editShape(store, metaRel(n), newLen, None))
    // Consolidated metadata flips HERE, not at the end of the append:
    // a reader discovering through .zmetadata (or the v3 root
    // zarr.json) sees whatever that one document says regardless of
    // the per-array edits above, so on the legacy re-chunk path it
    // must observe the new chunk grid BEFORE step 2.5 overwrites the
    // chunk files its old grid addressed (old grid + outerChunk-sized
    // chunk 0 = an undersized, torn read). After this refresh both
    // discovery paths agree on the new grid and the legacy files are
    // merely oversized — tolerated.
    refreshConsolidated(store, coordNames ++ varNames, meta0.coords.head.meta.isV3)

    coordRewriteTestHook("postflip")
    // 2.5) legacy-layout re-chunk, colliding prefix: only now that the
    // metadata declares the outerChunk grid are the chunk indices the
    // OLD layout addressed overwritten. In the window between the flip
    // and these writes a reader sees the old single-chunk file as an
    // OVERSIZED chunk 0 — the decoders size from the payload and the
    // element decoder reads only the metadata extent, so the read is
    // the correct prefix, never torn. (A finer-grained legacy layout —
    // not one this writer ever produced — has UNDERSIZED colliding
    // files in this window; those fail loudly as corrupt chunks until
    // the ascending rewrite below converges.)
    if (rechunkCoord)
      (0 until math.min(nLegacyCoordChunks, nCoordChunks)).foreach(writeCoordChunk)

    // 3) merge + rewrite .zstats sidecars (min/max entries AND sum
    // partials; the complete-coverage attestation survives an append
    // only if the pre-append sidecar was complete and every fresh
    // chunk produced a sum partial). EXECUTOR-side, one task per
    // variable, reading the fresh partials from the persisted shuffle
    // (never re-running the slab writes) and the pre-append sidecar
    // state from varMetas — which already ships to executors for the
    // slab writes above. Entries are key-sorted so the merged sidecar
    // bytes are deterministic.
    val wVarMetas = varMetas
    val wAppendSumKind = appendSumKind
    val mergeSummaries = keyedPartials.mapPartitionsWithIndex { (v, it) =>
      if (v >= wVarMetas.length) { require(it.isEmpty); Iterator.empty }
      else {
        val m = wVarMetas(v)
        val mine = it.map(_._2).toVector
        val fresh = mine.collect {
          case (ci, (mn, mx, _)) if !mn.isNaN => m.chunkKey(ci) -> (mn, mx)
        }.toMap
        val merged = m.chunkStats ++ fresh
        if (merged.nonEmpty) {
          import scala.math.Ordering.Implicits._
          val entries = merged.toSeq.sortBy(e => chunkKeyOrder(e._1))
            .map { case (k, (mn, mx)) => s""""$k": [$mn, $mx]""" }.mkString(",")
          val sumsOk = m.sumsComplete && wAppendSumKind(v) != 0 &&
            mine.forall(_._2._3 != null)
          val sumsJson =
            if (!sumsOk) ""
            else {
              val freshSums = mine.map { case (ci, (_, _, sj)) => m.chunkKey(ci) -> sj }.toMap
              val old = (m.chunkSums -- freshSums.keys).map { case (k, (s, c)) =>
                k -> s"[${s.toPlainString}, $c]"
              }
              // merged total = fold of the merged per-chunk partials
              // (appended chunk keys are disjoint from the old ones)
              val total = (old.values ++ freshSums.values).map(parseSumJson)
                .foldLeft((java.math.BigDecimal.ZERO, 0L)) {
                  case ((s, c), (s2, c2)) => (s.add(s2), c + c2)
                }
              (old ++ freshSums).toSeq.sortBy(e => chunkKeyOrder(e._1))
                .map { case (k, sj) => s""""$k": $sj""" }
                .mkString(""", "sums": {""", ",",
                  s"""}, "total": [${total._1.toPlainString}, ${total._2}], "complete": true""")
            }
          wStore.writeBytes(s"${m.name}/.zstats",
            s"""{"chunks": {$entries}$sumsJson}""".getBytes)
        }
        Iterator.single(v -> mine.size)
      }
    }.collect()
    keyedPartials.unpersist(false)
    lastStatsDriverRows = mergeSummaries.length

    ChunkIO.invalidatePath(store.path)
  }

  /** Re-embed every array's on-store metadata document into the
    * consolidated copy (v2 `.zmetadata`; v3 root `zarr.json`), if the
    * store carries one. Called mid-append, immediately after the
    * per-array shape edits — see the ordering note at the call site. */
  private def refreshConsolidated(store: ZarrStore, names: Seq[String], isV3: Boolean): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    store.readBytes(".zmetadata").foreach { bytes =>
      val node = mapper.readTree(bytes)
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      val md = node.get("metadata")
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      names.foreach { n =>
        store.readBytes(s"$n/.zarray").foreach(b =>
          md.set[com.fasterxml.jackson.databind.JsonNode](s"$n/.zarray", mapper.readTree(b)))
      }
      store.writeBytes(".zmetadata", mapper.writeValueAsBytes(node))
    }
    if (isV3) store.readBytes("zarr.json").foreach { bytes =>
      val node = mapper.readTree(bytes)
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      Option(node.get("consolidated_metadata"))
        .flatMap(c => Option(c.get("metadata")))
        .collect { case o: com.fasterxml.jackson.databind.node.ObjectNode => o }
        .foreach { md =>
          names.foreach { n =>
            store.readBytes(s"$n/zarr.json").foreach(b =>
              md.set[com.fasterxml.jackson.databind.JsonNode](n, mapper.readTree(b)))
          }
          store.writeBytes("zarr.json", mapper.writeValueAsBytes(node))
        }
    }
  }
}
