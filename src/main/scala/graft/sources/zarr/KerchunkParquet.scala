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
      recordSize: Int = defaultRecordSize, inlineThreshold: Long = 512L,
      inlineVars: Set[String] = Set.empty): Unit = {
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
      val rows = mutable.Map[Long, RefRow]()
      val thr = if (inlineVars.contains(v)) Long.MaxValue else inlineThreshold
      scanVarChunks(store, base, metaMap, v, version, grid, thr) {
        case (idx, lin, row) => rows += (lin -> row)
      }
      v -> rows
    }.toMap
    writeRefs(outDir, recordSize, metaDocs, perVar)
  }

  /** Point-in-time SNAPSHOT of a store as parquet refs — fromStore
    * with every COORDINATE array inlined (coordinates are
    * metadata-sized; data chunks stay byte-range refs).
    *
    * Why this is a consistent snapshot under appends: the outer-append
    * path refuses non-chunk-aligned extents, so existing DATA chunk
    * objects are immutable — an append only ADDS slab files and
    * rewrites metadata + the coordinate chunk. The snapshot inlines
    * both, so it keeps serving exactly the pre-append content while
    * the live store moves on (time travel for the append-only ingest
    * pattern; SnapshotSpec proves it). A ranged ref to the coordinate
    * would instead read a truncated frame of the REWRITTEN object —
    * loud, but not a snapshot. Full `mode("overwrite")` rewrites are
    * survived via GENERATION RETIREMENT (see the machinery below):
    * the overwrite moves the old store to an immutable generation
    * sibling and this snapshot's refs resolve through its
    * `redirects.json` — durable time travel, not just append-only
    * time travel. */
  def snapshot(storePath: String, outDir: String,
      recordSize: Int = defaultRecordSize, inlineThreshold: Long = 512L): Unit = {
    fromStore(storePath, outDir, recordSize, inlineThreshold,
      inlineVars = ZarrMeta.readStore(storePath).coordNames.toSet)
    registerSnapshot(storePath, outDir)
  }

  // ------------------------------------------------- snapshot generations

  /** Generation-aware snapshot machinery: a full `mode("overwrite")`
    * rewrite no longer strands live snapshots. [[snapshot]] records
    * its refs dir in a sibling registry (`<store>.__graft_snapshots`);
    * the overwrite commit calls [[retireGeneration]], which — when
    * live snapshots exist — MOVES the old store to an immutable
    * generation sibling (`<store>.__graft_gen_<stamp>`) instead of
    * deleting it, and points each snapshot's `redirects.json` at the
    * retired location. The refs READER resolves chunk URLs through
    * that file, so the snapshot keeps serving its point-in-time
    * content with zero data copied.
    *
    * GC story: each generation carries a sibling manifest
    * (`<gen>.__graft_refs`) listing the snapshot dirs redirected to
    * it; a generation is reclaimable once every listed snapshot is
    * gone, which [[gcGenerations]] checks and performs. Nothing is
    * reclaimed implicitly — retention is the operator's call, as with
    * any time-travel store. */
  private def parentAndName(p: String): (String, String) = {
    val s0 = p.stripSuffix("/")
    val i = s0.lastIndexOf('/')
    if (i < 0) (".", s0)
    else if (i == 0) ("/", s0.substring(1))
    else (s0.substring(0, i), s0.substring(i + 1))
  }

  private def registryName(name: String): String = s"$name.__graft_snapshots"

  private def absBase(p: String): String =
    if (p.contains("://")) p.stripSuffix("/")
    else Paths.get(p).toAbsolutePath.toString

  /** Record `refsDir` as a live snapshot of `storePath`. */
  private def registerSnapshot(storePath: String, refsDir: String): Unit = {
    val (parent, name) = parentAndName(storePath)
    val st = ZarrStore.open(parent)
    val reg = registryName(name)
    val prev = st.readBytes(reg).map(new String(_, StandardCharsets.UTF_8)).getOrElse("")
    val abs = absBase(refsDir)
    if (!prev.linesIterator.contains(abs))
      st.writeBytes(reg, (prev + abs + "\n").getBytes(StandardCharsets.UTF_8))
  }

  /** Registered snapshot dirs that still exist (a deleted snapshot
    * releases its claim). */
  private def liveSnapshots(storePath: String): Seq[String] = {
    val (parent, name) = parentAndName(storePath)
    ZarrStore.open(parent).readBytes(registryName(name))
      .map(new String(_, StandardCharsets.UTF_8)).getOrElse("")
      .linesIterator.map(_.trim).filter(_.nonEmpty)
      .filter(refs =>
        try { KerchunkUrlIO.readAll(s"$refs/.zmetadata"); true }
        catch { case _: Exception => false })
      .toSeq.distinct
  }

  /** Add `from -> to` to the snapshot's `redirects.json` (first
    * redirect for a base wins: the snapshot was taken against the
    * content now living at `to`, so a LATER overwrite of the same
    * base must not re-point it). */
  private def addRedirect(refsDir: String, from: String, to: String): Unit = {
    val (parent, name) = parentAndName(refsDir)
    val st = ZarrStore.open(parent)
    val mapper = new ObjectMapper()
    val node = st.readBytes(s"$name/redirects.json")
      .map(b => mapper.readTree(b).asInstanceOf[ObjectNode])
      .getOrElse(mapper.createObjectNode())
    if (!node.has(from)) {
      node.put(from, to)
      st.writeBytes(s"$name/redirects.json", mapper.writeValueAsBytes(node))
    }
  }

  /** Called by the overwrite commit BEFORE it would delete the
    * existing store: when live snapshots reference it, the store is
    * moved to a generation sibling and every snapshot redirected;
    * returns true (caller must skip its delete). With no live
    * snapshots the stale registry is dropped and false returned
    * (caller deletes as before — no behavior change for stores that
    * were never snapshotted). */
  def retireGeneration(storePath: String): Boolean = {
    val snaps = liveSnapshots(storePath)
    val (parent, name) = parentAndName(storePath)
    val parentStore = ZarrStore.open(parent)
    if (snaps.isEmpty) {
      parentStore.deleteObject(registryName(name))
      return false
    }
    val stamp =
      s"${System.currentTimeMillis()}_${java.util.UUID.randomUUID().toString.take(8)}"
    val genPath = s"${storePath.stripSuffix("/")}.__graft_gen_$stamp"
    ZarrStore.open(storePath).moveTo(genPath)
    val oldBase = absBase(storePath)
    val newBase = absBase(genPath)
    snaps.foreach(addRedirect(_, oldBase, newBase))
    parentStore.writeBytes(s"$name.__graft_gen_$stamp.__graft_refs",
      snaps.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    parentStore.deleteObject(registryName(name))
    true
  }

  /** Delete retired generations whose snapshots are ALL gone; returns
    * the deleted generation paths. */
  def gcGenerations(storePath: String): Seq[String] = {
    val (parent, name) = parentAndName(storePath)
    val parentStore = ZarrStore.open(parent)
    parentStore.listDirs().filter(_.startsWith(s"$name.__graft_gen_")).flatMap { gen =>
      val manifest = s"$gen.__graft_refs"
      val anyLive = parentStore.readBytes(manifest)
        .map(new String(_, StandardCharsets.UTF_8)).getOrElse("")
        .linesIterator.map(_.trim).filter(_.nonEmpty)
        .exists(refs =>
          try { KerchunkUrlIO.readAll(s"$refs/.zmetadata"); true }
          catch { case _: Exception => false })
      if (anyLive) None
      else {
        ZarrStore.open(s"$parent/$gen").deleteRecursively()
        parentStore.deleteObject(manifest)
        Some(s"$parent/$gen")
      }
    }
  }

  /** Chunk-key naming mirrors the store's own encoding: v2 indices
    * joined by dimension_separator (default "."), v3 "c/" prefix +
    * chunk_key_encoding separator (default "/"). */
  private def chunkSepOf(metaMap: Map[String, Array[Byte]], v: String,
      version: Int): String = {
    val mapper = new ObjectMapper()
    if (version == 3)
      Option(mapper.readTree(metaMap(s"$v/zarr.json"))
        .at("/chunk_key_encoding/configuration/separator").asText(""))
        .filter(_.nonEmpty).getOrElse("/")
    else
      Option(mapper.readTree(metaMap(s"$v/.zarray")).get("dimension_separator"))
        .filterNot(_.isNull).map(_.asText).getOrElse(".")
  }

  private def chunkTail(version: Int, sep: String, idx: Seq[Long]): String =
    if (version == 3) "c" + idx.map(i => s"$sep$i").mkString
    else if (idx.isEmpty) "0" else idx.mkString(sep)

  /** Enumerate `v`'s chunk grid (one `sizeOf` probe per cell — no
    * listing API needed), calling `f(perDimIdx, linearIdx, row)` for
    * every PRESENT chunk; absent cells (fill) are skipped. */
  private def scanVarChunks(store: ZarrStore, base: String,
      metaMap: Map[String, Array[Byte]], v: String, version: Int,
      grid: Array[Long], inlineThreshold: Long)(
      f: (Array[Long], Long, RefRow) => Unit): Unit = {
    val sep = chunkSepOf(metaMap, v, version)
    val n = grid.product
    var lin = 0L
    while (lin < n) {
      // linear C-order index → per-dim chunk indices
      var rem = lin
      val idx = new Array[Long](grid.length)
      var d = grid.length - 1
      while (d >= 0) { idx(d) = rem % grid(d); rem /= grid(d); d -= 1 }
      val key = s"$v/${chunkTail(version, sep, idx.toSeq)}"
      store.sizeOf(key).foreach { sz =>
        f(idx, lin, if (sz <= inlineThreshold)
          RefRow(None, 0L, 0L, Some(store.readBytes(key).getOrElse(
            throw new java.io.IOException(s"$base/$key vanished during scan"))))
        else RefRow(Some(s"$base/$key"), 0L, sz, None))
      }
      lin += 1
    }
  }

  // ------------------------------------------------- multi-store combine

  /** Virtually CONCATENATE existing Zarr stores along `concatDim` into
    * one parquet-refs store — the fsspec/kerchunk `MultiZarrToZarr`
    * shape (e.g. one store per day of an archive → one queryable
    * virtual dataset), with no data movement: every chunk ref points
    * back into its source store.
    *
    * Semantics and constraints (the same grid-validity rules
    * MultiZarrToZarr enforces):
    *  - every store must hold the SAME variables at the same zarr
    *    version; variables whose dimensions include `concatDim`
    *    concatenate (data vars AND the `concatDim` coordinate array);
    *    all other variables must carry byte-identical array metadata
    *    across stores and are taken from the first store;
    *  - concatenating variables must share chunk shape and all
    *    non-concat extents; every store except the LAST must have a
    *    `concatDim` extent that is a multiple of the chunk extent
    *    (an interior ragged chunk would corrupt the combined grid —
    *    a ragged tail on the final store is fine);
    *  - `.zstats` sidecars survive: per-chunk min/max and sum entries
    *    are key-remapped by the chunk offset and merged; the O(1)
    *    "total"/"complete" record is re-derived only when EVERY store
    *    attests complete sums (else readers fold the chunk entries).
    *
    * Chunk refs are ranged against each SOURCE store (or inlined at or
    * under `inlineThreshold`), so the combine is metadata-sized work:
    * one `sizeOf` probe per chunk cell, no data reads. */
  def combineStores(storePaths: Seq[String], concatDim: String, outDir: String,
      recordSize: Int = defaultRecordSize, inlineThreshold: Long = 512L): Unit = {
    require(storePaths.length >= 2, "combineStores needs at least two stores")
    val mapper = new ObjectMapper()
    final case class Src(path: String, store: ZarrStore, version: Int,
        vars: Seq[String], metaMap: Map[String, Array[Byte]], base: String)
    val srcs = storePaths.map { p =>
      val st = ZarrStore.open(p)
      val ver = ZarrMeta.detectVersion(st)
      val vars = st.listDirs().filter(d =>
        st.sizeOf(s"$d/.zarray").isDefined || st.sizeOf(s"$d/zarr.json").isDefined).sorted
      require(vars.nonEmpty, s"$p: no Zarr arrays found")
      val rootDocs = if (ver == 3) Seq("zarr.json") else Seq(".zgroup", ".zattrs")
      val docKeys = rootDocs ++ vars.flatMap(v =>
        if (ver == 3) Seq(s"$v/zarr.json", s"$v/.zstats")
        else Seq(s"$v/.zarray", s"$v/.zattrs", s"$v/.zstats"))
      val metaMap = docKeys.flatMap(k => st.readBytes(k).map(k -> _)).toMap
      val base = if (p.contains("://")) p.stripSuffix("/")
                 else Paths.get(p).toAbsolutePath.toString
      Src(p, st, ver, vars, metaMap, base)
    }
    val version = srcs.head.version
    require(srcs.forall(_.version == version),
      s"mixed zarr versions across stores: ${srcs.map(s => s"${s.path}=v${s.version}").mkString(", ")}")
    val vars = srcs.head.vars
    srcs.tail.foreach(s => require(s.vars == vars,
      s"variable sets differ: ${srcs.head.path} has $vars, ${s.path} has ${s.vars}"))

    def arrayDocKey(v: String) = if (version == 3) s"$v/zarr.json" else s"$v/.zarray"
    def arrayNode(s: Src, v: String): JsonNode = mapper.readTree(s.metaMap(arrayDocKey(v)))
    def longs(n: JsonNode): Array[Long] = {
      val it = n.elements(); val b = Array.newBuilder[Long]
      while (it.hasNext) b += it.next().asLong()
      b.result()
    }
    def shapeOf(s: Src, v: String): Array[Long] = longs(arrayNode(s, v).get("shape"))
    def chunksOf(s: Src, v: String): Array[Long] = {
      val n = arrayNode(s, v)
      if (version == 3) longs(n.at("/chunk_grid/configuration/chunk_shape"))
      else longs(n.get("chunks"))
    }
    // decoded store metadata, computed at most once per store (used by
    // the dims fallback and the coordinate materialization)
    val storeMeta = mutable.Map[String, ZarrStoreMeta]()
    def metaOf(s: Src): ZarrStoreMeta =
      storeMeta.getOrElseUpdate(s.path, ZarrMeta.readStore(s.path))
    /** Dimension names: v3 `dimension_names`, v2 xarray
      * `_ARRAY_DIMENSIONS`; a 1-D array named like the dim is its own
      * coordinate even without attributes; otherwise fall back to the
      * reader's inferred coordinate order (stores written without
      * naming conventions). */
    def dimsOf(s: Src, v: String): Seq[String] = {
      val named: Option[Seq[String]] =
        if (version == 3)
          Option(arrayNode(s, v).get("dimension_names")).filter(_.isArray).map { dn =>
            val it = dn.elements(); val b = Seq.newBuilder[String]
            while (it.hasNext) b += it.next().asText()
            b.result()
          }
        else s.metaMap.get(s"$v/.zattrs").flatMap { bytes =>
          Option(mapper.readTree(bytes).get("_ARRAY_DIMENSIONS"))
            .filter(_.isArray).map { dn =>
              val it = dn.elements(); val b = Seq.newBuilder[String]
              while (it.hasNext) b += it.next().asText()
              b.result()
            }
        }
      named.getOrElse {
        val rank = shapeOf(s, v).length
        if (rank == 1) Seq(v)
        else {
          val order = metaOf(s).coordNames
          if (rank == order.length) order else Seq.empty
        }
      }
    }

    val concatVars = vars.filter(v => dimsOf(srcs.head, v).contains(concatDim))
    require(concatVars.nonEmpty,
      s"no variable has dimension '$concatDim' (dims seen: ${vars.map(v => s"$v=${dimsOf(srcs.head, v).mkString("[", ",", "]")}").mkString(", ")})")
    // the concat dimension's own 1-D coordinate array is MATERIALIZED
    // (decoded, concatenated, inlined raw) rather than ref-stitched:
    // writers commonly store a coordinate as one chunk per store, so
    // per-store chunk extents differ and no uniform combined grid
    // exists for it — and a coordinate is metadata-sized by nature.
    // (This is also what kerchunk's MultiZarrToZarr does for the
    // concat coord.) Everything else concatenates by reference.
    val coordSelf = concatVars.filter(v => dimsOf(srcs.head, v) == Seq(concatDim))
    val gridVars = concatVars.filterNot(coordSelf.contains)

    // validate geometry; per concat var: axis, chunk extent, per-store
    // chunk-grid extents along the axis (→ offsets)
    val geometry = gridVars.map { v =>
      val d0 = dimsOf(srcs.head, v)
      val axis = d0.indexOf(concatDim)
      val ch0 = chunksOf(srcs.head, v)
      val sh0 = shapeOf(srcs.head, v)
      srcs.tail.foreach { s =>
        require(dimsOf(s, v) == d0, s"${s.path}/$v: dimension names differ")
        require(java.util.Arrays.equals(chunksOf(s, v), ch0),
          s"${s.path}/$v: chunk shape differs")
        val sh = shapeOf(s, v)
        require(sh.length == sh0.length && sh.indices.forall(i =>
          i == axis || sh(i) == sh0(i)),
          s"${s.path}/$v: non-concat extents differ")
      }
      srcs.init.foreach { s =>
        val ext = shapeOf(s, v)(axis)
        require(ext % ch0(axis) == 0,
          s"${s.path}/$v: extent $ext along '$concatDim' is not a multiple of " +
            s"chunk ${ch0(axis)} — an interior ragged chunk would corrupt the " +
            "combined grid (only the LAST store may be ragged)")
      }
      val gridExts = srcs.map(s => (shapeOf(s, v)(axis) + ch0(axis) - 1) / ch0(axis))
      v -> (axis, ch0(axis), gridExts)
    }.toMap
    // static vars: array metadata must be byte-identical across
    // stores, AND the chunk DATA must match — matching shapes/dtypes
    // with different values (e.g. two stores on different lat grids)
    // would otherwise combine silently, serving store 0's data for
    // every row. Static vars are metadata-sized by nature (they're
    // coordinates/ancillary arrays — everything bulky carries the
    // concat dim), so a per-chunk byte compare is cheap; mismatch
    // fails loudly like the ragged-extent check.
    vars.filterNot(concatVars.contains).foreach { v =>
      srcs.tail.foreach(s => require(java.util.Arrays.equals(
        s.metaMap(arrayDocKey(v)), srcs.head.metaMap(arrayDocKey(v))),
        s"static variable '$v': array metadata differs between " +
          s"${srcs.head.path} and ${s.path} — only '$concatDim'-bearing " +
          "variables may vary across combined stores"))
      val s0 = srcs.head
      val grid = chunkGridOf(s0.metaMap, v).get
      val sep = chunkSepOf(s0.metaMap, v, version)
      val n = grid.product
      var lin = 0L
      while (lin < n) {
        var rem = lin
        val idx = new Array[Long](grid.length)
        var d = grid.length - 1
        while (d >= 0) { idx(d) = rem % grid(d); rem /= grid(d); d -= 1 }
        val key = s"$v/${chunkTail(version, sep, idx.toSeq)}"
        val ref = s0.store.readBytes(key)
        srcs.tail.foreach { s =>
          val other = s.store.readBytes(key)
          require(ref.isDefined == other.isDefined &&
            ref.zip(other).forall { case (a, b) => java.util.Arrays.equals(a, b) },
            s"static variable '$v': chunk '$key' differs between " +
              s"${s0.path} and ${s.path} — the stores disagree on " +
              s"non-'$concatDim' content and cannot be combined")
        }
        lin += 1
      }
    }

    // materialize the concat coordinate: decoded values concatenated,
    // re-encoded raw little-endian as ONE inline chunk
    val coordBytes: Map[String, (Array[Byte], Long)] = coordSelf.map { v =>
      val perStore = srcs.map { s =>
        val cd = metaOf(s).coords.find(_.meta.name == v)
          .getOrElse(throw new IllegalArgumentException(
            s"${s.path}: cannot materialize coordinate '$v'"))
        (cd.meta.dtype, cd.raw, cd.length)
      }
      val dt = perStore.head._1
      require(perStore.forall(_._1 == dt), s"coordinate '$v': dtype differs across stores")
      require("iuf".contains(dt.kind),
        s"coordinate '$v': cannot materialize non-numeric dtype '${dt.kind}${dt.size}' for combining")
      val total = perStore.map(_._3.toLong).sum
      val buf = java.nio.ByteBuffer.allocate((total * dt.size).toInt)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      perStore.foreach { case (_, raw, n) =>
        (dt.kind, dt.size) match {
          case ('i', 1) => buf.put(raw.asInstanceOf[Array[Byte]], 0, n)
          case ('i', 2) => val a = raw.asInstanceOf[Array[Short]]; (0 until n).foreach(i => buf.putShort(a(i)))
          case ('i', 4) => val a = raw.asInstanceOf[Array[Int]]; (0 until n).foreach(i => buf.putInt(a(i)))
          case ('i', 8) | ('u', 8) => val a = raw.asInstanceOf[Array[Long]]; (0 until n).foreach(i => buf.putLong(a(i)))
          case ('u', 1) => val a = raw.asInstanceOf[Array[Short]]; (0 until n).foreach(i => buf.put(a(i).toByte))
          case ('u', 2) => val a = raw.asInstanceOf[Array[Int]]; (0 until n).foreach(i => buf.putShort(a(i).toShort))
          case ('u', 4) => val a = raw.asInstanceOf[Array[Long]]; (0 until n).foreach(i => buf.putInt(a(i).toInt))
          case ('f', 4) => val a = raw.asInstanceOf[Array[Float]]; (0 until n).foreach(i => buf.putFloat(a(i)))
          case ('f', 8) => val a = raw.asInstanceOf[Array[Double]]; (0 until n).foreach(i => buf.putDouble(a(i)))
          case other => throw new IllegalArgumentException(
            s"coordinate '$v': unsupported dtype $other")
        }
      }
      v -> (buf.array(), total)
    }.toMap

    // combined metadata: first store's docs, with concat vars' shape
    // rewritten, the materialized coord re-declared (single raw
    // chunk), and .zstats remapped+merged
    val metaDocs = srcs.head.metaMap.toSeq.sortBy(_._1).flatMap {
      case (k, bytes) if k.endsWith("/.zstats") =>
        val v = k.stripSuffix("/.zstats")
        if (coordSelf.contains(v)) None // re-derivable; values are inline anyway
        else if (!gridVars.contains(v)) Some(k -> bytes)
        else mergedZstats(srcs.map(s => s.metaMap.get(k)), v, geometry(v)._1,
          geometry(v)._3, version, mapper,
          chunkSepOf(srcs.head.metaMap, v, version)).map(k -> _)
      case (k, bytes) if coordSelf.exists(v => k == arrayDocKey(v)) =>
        val v = coordSelf.find(v2 => k == arrayDocKey(v2)).get
        val total = coordBytes(v)._2
        val node = mapper.readTree(bytes).asInstanceOf[ObjectNode]
        node.putArray("shape").add(total)
        if (version == 3) {
          node.`with`("chunk_grid").`with`("configuration")
            .putArray("chunk_shape").add(total)
          val codecs = node.putArray("codecs")
          val bytesCodec = codecs.addObject()
          bytesCodec.put("name", "bytes")
          bytesCodec.putObject("configuration").put("endian", "little")
        } else {
          node.putArray("chunks").add(total)
          node.putNull("compressor")
          node.putNull("filters")
          // the materialized bytes are LITTLE-ENDIAN — a big-endian
          // (or platform-native) source dtype string kept verbatim
          // would silently decode byte-swapped values
          val dt = node.get("dtype").asText()
          if (dt.startsWith(">") || dt.startsWith("="))
            node.put("dtype", "<" + dt.substring(1))
        }
        Some(k -> mapper.writeValueAsBytes(node))
      case (k, bytes) if gridVars.exists(v => k == arrayDocKey(v)) =>
        val v = gridVars.find(v2 => k == arrayDocKey(v2)).get
        val (axis, _, _) = geometry(v)
        val node = mapper.readTree(bytes).asInstanceOf[ObjectNode]
        val total = srcs.map(s => shapeOf(s, v)(axis)).sum
        val sh = shapeOf(srcs.head, v)
        val shapeArr = node.putArray("shape")
        sh.indices.foreach(i => shapeArr.add(if (i == axis) total else sh(i)))
        Some(k -> mapper.writeValueAsBytes(node))
      case (k, bytes) => Some(k -> bytes)
    }
    // the v3 root zarr.json embeds every array's metadata under
    // consolidated_metadata — readers prefer it over per-array docs,
    // so its entries must be the REWRITTEN docs, not store 0's stale
    // copies (shape/codecs would silently disagree)
    val metaDocsOut =
      if (version != 3) metaDocs
      else metaDocs.map {
        case ("zarr.json", bytes) =>
          val root = mapper.readTree(bytes).asInstanceOf[ObjectNode]
          Option(root.get("consolidated_metadata")).foreach { cm =>
            val m = cm.asInstanceOf[ObjectNode].`with`("metadata")
            metaDocs.foreach { case (k2, b2) =>
              if (k2.endsWith("/zarr.json"))
                m.set[ObjectNode](k2.stripSuffix("/zarr.json"), mapper.readTree(b2))
            }
            // coordSelf .zstats were dropped from the per-array docs;
            // drop any embedded copies too
            coordSelf.foreach(v => m.remove(s"$v/.zstats"))
          }
          "zarr.json" -> mapper.writeValueAsBytes(root)
        case kv => kv
      }

    // chunk refs: static vars from store 0; materialized coords as one
    // inline chunk; grid vars from every store with the axis index
    // shifted by the store's chunk offset
    val perVar = vars.map { v =>
      val rows = mutable.Map[Long, RefRow]()
      if (coordSelf.contains(v)) {
        rows += (0L -> RefRow(None, 0L, 0L, Some(coordBytes(v)._1)))
      } else if (!gridVars.contains(v)) {
        val s = srcs.head
        val grid = chunkGridOf(s.metaMap, v).get
        scanVarChunks(s.store, s.base, s.metaMap, v, version, grid,
          inlineThreshold) { case (_, lin, row) => rows += (lin -> row) }
      } else {
        val (axis, _, gridExts) = geometry(v)
        val grid0 = chunkGridOf(srcs.head.metaMap, v).get
        val outGrid = grid0.clone(); outGrid(axis) = gridExts.sum
        var off = 0L
        srcs.zip(gridExts).foreach { case (s, ext) =>
          val grid = chunkGridOf(s.metaMap, v).get
          val o = off
          scanVarChunks(s.store, s.base, s.metaMap, v, version, grid,
            inlineThreshold) { case (idx, _, row) =>
            val shifted = idx.clone(); shifted(axis) += o
            val lin = shifted.zip(outGrid).foldLeft(0L) {
              case (acc, (i, g)) => acc * g + i
            }
            rows += (lin -> row)
          }
          off += ext
        }
      }
      v -> rows
    }.toMap
    writeRefs(outDir, recordSize, metaDocsOut, perVar)
  }

  /** Merge per-store `.zstats` sidecars for a concatenating variable:
    * chunk keys shifted by each store's chunk offset along `axis`;
    * the O(1) total re-derived only when every store attests complete
    * sums. Any store missing its sidecar → no merged sidecar (readers
    * then scan, which is always correct). */
  private def mergedZstats(docs: Seq[Option[Array[Byte]]], v: String,
      axis: Int, gridExts: Seq[Long], version: Int,
      mapper: ObjectMapper, sep: String): Option[Array[Byte]] = {
    if (docs.exists(_.isEmpty)) return None
    // rebuild shifted keys with the store's DECLARED separator (v2
    // dimension_separator / v3 chunk_key_encoding), not a hardcoded
    // one: merged sidecar keys must match ZarrArrayMeta.chunkKey
    // lookups or pruning is silently lost (and groupTotals' index
    // parse throws at query time)
    def shift(key: String, off: Long): String = {
      val parts = key.split("[./]").filter(_ != "c").map(_.toLong)
      parts(axis) += off
      chunkTail(version, sep, parts.toSeq)
    }
    val parsed = docs.map(d => mapper.readTree(d.get))
    val offs = gridExts.scanLeft(0L)(_ + _)
    val chunks = mutable.LinkedHashMap[String, String]()
    val sums = mutable.LinkedHashMap[String, String]()
    parsed.zip(offs).foreach { case (n, off) =>
      Option(n.get("chunks")).filter(_.isObject).foreach { c =>
        val it = c.properties().iterator()
        while (it.hasNext) { val e = it.next()
          chunks += (shift(e.getKey, off) -> e.getValue.toString) }
      }
      Option(n.get("sums")).filter(_.isObject).foreach { c =>
        val it = c.properties().iterator()
        while (it.hasNext) { val e = it.next()
          sums += (shift(e.getKey, off) -> e.getValue.toString) }
      }
    }
    val allComplete = parsed.forall(n =>
      Option(n.get("complete")).exists(_.asBoolean(false)) && n.get("total") != null)
    val chunksJson = chunks.map { case (k, j) => s""""$k": $j""" }.mkString(",")
    val sumsJson =
      if (sums.isEmpty) ""
      else {
        val totalTail =
          if (!allComplete) ""
          else {
            val total = parsed.map(_.get("total")).foldLeft(
              (java.math.BigDecimal.ZERO, 0L)) { case ((ts, tc), t) =>
              (ts.add(t.get(0).decimalValue()), tc + t.get(1).asLong())
            }
            s""", "total": [${total._1.toPlainString}, ${total._2}], "complete": true"""
          }
        sums.map { case (k, j) => s""""$k": $j""" }
          .mkString(""", "sums": {""", ",", s"}$totalTail")
      }
    Some(s"""{"chunks": {$chunksJson}$sumsJson}""".getBytes(StandardCharsets.UTF_8))
  }
}
