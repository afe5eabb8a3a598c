package graft.sources.zarr

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.collection.mutable

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.{ParquetReader, ParquetWriter}
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport, GroupWriteSupport}
import org.apache.parquet.schema.{MessageType, MessageTypeParser}

/** Shared machinery for [[KerchunkParquetStore]]: the record-file LRU,
  * the chunk-key → linear-index math, and the JSON→parquet converter
  * (also the test fixture generator — ZarrKerchunkSpec converts its
  * JSON refs and asserts read parity). */
object KerchunkParquetRefs {

  val defaultRecordSize = 10000

  /** One decoded parquet ref row. */
  final case class RefRow(path: Option[String], offset: Long, size: Long,
                          raw: Option[Array[Byte]])

  private val schema: MessageType = MessageTypeParser.parseMessageType(
    """message kerchunk_refs {
      |  optional binary path (STRING);
      |  optional int64 offset;
      |  optional int64 size;
      |  optional binary raw;
      |}""".stripMargin)

  /** C-order chunk grid (ceil(shape/chunks) per dim) of variable `v`,
    * from its v2 `.zarray` or v3 `zarr.json` metadata document. */
  private[zarr] def chunkGridOf(metadata: Map[String, Array[Byte]],
      v: String): Option[Array[Long]] = {
    val mapper = new ObjectMapper()
    def dims(node: JsonNode): Array[Long] = {
      val it = node.elements(); val b = Array.newBuilder[Long]
      while (it.hasNext) b += it.next().asLong()
      b.result()
    }
    metadata.get(s"$v/.zarray").map { bytes =>
      val n = mapper.readTree(bytes)
      dims(n.get("shape")).zip(dims(n.get("chunks")))
        .map { case (s, c) => (s + c - 1) / c }
    }.orElse(metadata.get(s"$v/zarr.json").map { bytes =>
      val n = mapper.readTree(bytes)
      val cs = dims(n.at("/chunk_grid/configuration/chunk_shape"))
      dims(n.get("shape")).zip(cs).map { case (s, c) => (s + c - 1) / c }
    })
  }

  /** Linear C-order index of a chunk key tail ("0.1", "0/1", or v3
    * "c/0/1") within `grid`; None when the tail is not a chunk key
    * (e.g. ".zattrs") or indices fall outside the grid. */
  private[zarr] def chunkLinear(tail: String, grid: Array[Long]): Option[Long] = {
    val parts = tail.split("[./]").filter(_ != "c")
    if (parts.length != grid.length || parts.exists(p => !p.forall(_.isDigit)))
      return None
    val idx = parts.map(_.toLong)
    if (idx.zip(grid).exists { case (i, g) => i >= g }) return None
    Some(idx.zip(grid).foldLeft(0L) { case (acc, (i, g)) => acc * g + i })
  }

  // ------------------------------------------------- record-file LRU

  /** Decoded record files, keyed (storePath, var, record). One entry
    * is ≤ record_size small rows (~1 MB at the default 10k); the cap
    * bounds executor memory regardless of the archive's total ref
    * count. */
  private val recCache = new java.util.LinkedHashMap[(String, String, Long),
      Option[IndexedSeq[RefRow]]](32, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[(String, String, Long), Option[IndexedSeq[RefRow]]]): Boolean =
      size() > 16
  }

  private[zarr] def rowsOf(storePath: String, v: String,
      rec: Long): Option[IndexedSeq[RefRow]] = {
    val key = (storePath, v, rec)
    recCache.synchronized {
      val hit = recCache.get(key)
      if (hit != null) return hit
    }
    val loaded = readRecordFile(s"$storePath/$v/refs.$rec.parq")
    recCache.synchronized { recCache.put(key, loaded) }
    loaded
  }

  private def readRecordFile(file: String): Option[IndexedSeq[RefRow]] = {
    val local = !file.contains("://")
    if (local && !Files.exists(Paths.get(file))) return None
    val reader =
      try ParquetReader.builder(new GroupReadSupport(),
        new org.apache.hadoop.fs.Path(file)).withConf(new Configuration()).build()
      catch { case _: java.io.FileNotFoundException => return None }
    try {
      val rows = IndexedSeq.newBuilder[RefRow]
      var g: Group = reader.read()
      while (g != null) {
        def has(f: String): Boolean = g.getFieldRepetitionCount(f) > 0
        rows += RefRow(
          if (has("path")) Some(g.getString("path", 0)).filter(_.nonEmpty) else None,
          if (has("offset")) g.getLong("offset", 0) else 0L,
          if (has("size")) g.getLong("size", 0) else 0L,
          if (has("raw")) Some(g.getBinary("raw", 0).getBytes) else None)
        g = reader.read()
      }
      Some(rows.result())
    } finally reader.close()
  }

  /** Drop cached record files for a store path (tests). */
  private[zarr] def invalidate(storePath: String): Unit = recCache.synchronized {
    val it = recCache.keySet().iterator()
    while (it.hasNext) if (it.next()._1 == storePath) it.remove()
  }

  // ------------------------------------------------- refs emission

  /** Write the parquet refs layout: `.zmetadata` (metadata docs parsed
    * to JSON where they are JSON) + per-variable dense record files.
    * Shared by the JSON converter and the store scanner. */
  private def writeRefs(outDir: String, recordSize: Int,
      metaDocs: Seq[(String, Array[Byte])],
      perVar: collection.Map[String, collection.Map[Long, RefRow]]): Unit = {
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    val metaNode = root.putObject("metadata")
    metaDocs.foreach { case (k, bytes) =>
      val text = new String(bytes, StandardCharsets.UTF_8)
      try metaNode.set[ObjectNode](k, mapper.readTree(text))
      catch { case _: Exception => metaNode.put(k, text) }
    }
    root.put("record_size", recordSize)
    Files.createDirectories(Paths.get(outDir))
    Files.write(Paths.get(outDir, ".zmetadata"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
    val factory = new SimpleGroupFactory(schema)
    perVar.foreach { case (v, rows) =>
      Files.createDirectories(Paths.get(outDir, v))
      rows.keys.groupBy(_ / recordSize).foreach { case (rec, lins) =>
        val conf = new Configuration()
        GroupWriteSupport.setSchema(schema, conf)
        val w: ParquetWriter[Group] = ExampleParquetWriter
          .builder(new org.apache.hadoop.fs.Path(s"$outDir/$v/refs.$rec.parq"))
          .withConf(conf).build()
        try {
          // dense records: absent chunks are all-null rows, so row i
          // within the file IS linear index rec*recordSize + i
          val maxIn = lins.max % recordSize
          (0L to maxIn).foreach { i =>
            val g = factory.newGroup()
            rows.get(rec * recordSize + i).foreach { r =>
              r.path.foreach(p => g.append("path", p))
              g.append("offset", r.offset)
              g.append("size", r.size)
              r.raw.foreach(b => g.append("raw",
                org.apache.parquet.io.api.Binary.fromConstantByteArray(b)))
            }
            w.write(g)
          }
        } finally w.close()
      }
    }
    invalidate(outDir)
  }

  // ------------------------------------------------- JSON → parquet

  /** Convert a kerchunk JSON refs document into the parquet refs
    * layout at `outDir` (driver-side tooling + test fixture path).
    * Byte-range refs stay ranges — nothing is materialized — so the
    * conversion is metadata-sized, not archive-sized. */
  def fromJson(jsonPath: String, outDir: String,
      recordSize: Int = defaultRecordSize): Unit = {
    val src = KerchunkStore(jsonPath)
    val entries = src.resolvedRefs
    val (metaKeys, chunkKeys) = entries.keys.toSeq.partition(k =>
      !k.contains("/") || k.endsWith(".zarray") || k.endsWith(".zattrs") ||
        k.endsWith(".zgroup") || k.endsWith("zarr.json") || k == ".zmetadata")
    def bytesOf(k: String): Array[Byte] = entries(k) match {
      case KerchunkStore.Inline(b) => b
      case KerchunkStore.Range(url, off, len) => KerchunkUrlIO.readRange(url, off, len)
      case KerchunkStore.Whole(url) => KerchunkUrlIO.readAll(url)
    }
    val metaDocs = metaKeys.map(k => k -> bytesOf(k))
    val metaMap = metaDocs.toMap
    // chunk refs grouped per variable, placed at their linear index
    val perVar = mutable.Map[String, mutable.Map[Long, RefRow]]()
    chunkKeys.foreach { k =>
      val v = k.takeWhile(_ != '/')
      val grid = chunkGridOf(metaMap, v).getOrElse(
        throw new IllegalArgumentException(
          s"$jsonPath: chunk key '$k' but no array metadata for '$v'"))
      val lin = chunkLinear(k.substring(v.length + 1), grid).getOrElse(
        throw new IllegalArgumentException(s"$jsonPath: unparseable chunk key '$k'"))
      val row = entries(k) match {
        case KerchunkStore.Inline(b) => RefRow(None, 0L, 0L, Some(b))
        case KerchunkStore.Range(url, off, len) => RefRow(Some(url), off, len, None)
        case KerchunkStore.Whole(url) => RefRow(Some(url), 0L, 0L, None)
      }
      perVar.getOrElseUpdate(v, mutable.Map.empty) += (lin -> row)
    }
    writeRefs(outDir, recordSize, metaDocs, perVar)
  }

  // ------------------------------------------------- store → parquet

  /** Scan an EXISTING Zarr store (any backend `ZarrStore.open` can
    * dispatch — local, s3a/gs/hdfs, http) and emit parquet refs at
    * `outDir`, closing the virtualization loop without external
    * tooling: archive → refs → [[KerchunkParquetStore]] read, no
    * Python/fsspec required.
    *
    *  - metadata documents (`.zgroup`/`.zattrs`/`.zarray`/`zarr.json`,
    *    plus graft's `.zstats` sidecars so statistics pruning and
    *    SUM/AVG pushdown survive virtualization) inline into
    *    `.zmetadata`;
    *  - chunks at or under `inlineThreshold` bytes inline as `raw`
    *    (kerchunk's convention for tiny objects — saves a round-trip
    *    per read);
    *  - larger chunks become whole-object ranged refs `(path, 0,
    *    size)` against the source store's absolute location.
    *
    * Candidate chunk keys are ENUMERATED from the chunk grid (one
    * `sizeOf` probe per cell, no listing API needed — works on stores
    * whose backend cannot list, e.g. http); absent chunks (fill) get
    * all-null rows. Driver-side tooling: the work is one metadata
    * probe per chunk, not per byte — for an archive with millions of
    * chunks, shard the call per variable or per store across a job. */
  def fromStore(storePath: String, outDir: String,
      recordSize: Int = defaultRecordSize, inlineThreshold: Long = 512L): Unit = {
    val store = ZarrStore.open(storePath)
    val version = ZarrMeta.detectVersion(store)
    val mapper = new ObjectMapper()
    val vars = store.listDirs().filter(d =>
      store.sizeOf(s"$d/.zarray").isDefined || store.sizeOf(s"$d/zarr.json").isDefined)
    require(vars.nonEmpty, s"$storePath: no Zarr arrays found to virtualize")
    val rootDocs = if (version == 3) Seq("zarr.json") else Seq(".zgroup", ".zattrs")
    val docKeys = rootDocs ++ vars.flatMap(v =>
      if (version == 3) Seq(s"$v/zarr.json", s"$v/.zstats")
      else Seq(s"$v/.zarray", s"$v/.zattrs", s"$v/.zstats"))
    val metaDocs = docKeys.flatMap(k => store.readBytes(k).map(k -> _))
    val metaMap = metaDocs.toMap
    val base =
      if (storePath.contains("://")) storePath.stripSuffix("/")
      else Paths.get(storePath).toAbsolutePath.toString
    val perVar = vars.map { v =>
      val grid = chunkGridOf(metaMap, v).getOrElse(
        throw new IllegalArgumentException(s"$storePath/$v: unreadable array metadata"))
      // chunk-key naming mirrors the store's own encoding: v2 indices
      // joined by dimension_separator (default "."), v3 "c/" prefix +
      // chunk_key_encoding separator (default "/")
      val sep =
        if (version == 3)
          Option(mapper.readTree(metaMap(s"$v/zarr.json"))
            .at("/chunk_key_encoding/configuration/separator").asText(""))
            .filter(_.nonEmpty).getOrElse("/")
        else
          Option(mapper.readTree(metaMap(s"$v/.zarray")).get("dimension_separator"))
            .filterNot(_.isNull).map(_.asText).getOrElse(".")
      def tail(idx: Seq[Long]): String =
        if (version == 3) "c" + idx.map(i => s"$sep$i").mkString
        else if (idx.isEmpty) "0" else idx.mkString(sep)
      val rows = mutable.Map[Long, RefRow]()
      val n = grid.product
      var lin = 0L
      while (lin < n) {
        // linear C-order index → per-dim chunk indices
        var rem = lin
        val idx = new Array[Long](grid.length)
        var d = grid.length - 1
        while (d >= 0) { idx(d) = rem % grid(d); rem /= grid(d); d -= 1 }
        val key = s"$v/${tail(idx.toSeq)}"
        store.sizeOf(key).foreach { sz =>
          rows += (lin -> (if (sz <= inlineThreshold)
            RefRow(None, 0L, 0L, Some(store.readBytes(key).getOrElse(
              throw new java.io.IOException(s"$storePath/$key vanished during scan"))))
          else RefRow(Some(s"$base/$key"), 0L, sz, None)))
        }
        lin += 1
      }
      v -> rows
    }.toMap
    writeRefs(outDir, recordSize, metaDocs, perVar)
  }
}
