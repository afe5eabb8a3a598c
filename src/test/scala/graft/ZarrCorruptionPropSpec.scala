package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Randomized corruption-handling property: whatever is wrong with a
  * store, a read must either FAIL LOUDLY with enough context to find
  * the bad object, or follow the format's legal absence semantics
  * (a missing chunk IS legal — it reads as fill_value). It must never
  * return silently wrong data. At fleet scale a single rotted object
  * in a bucket is a certainty; "loud or legal" is the property that
  * keeps it from poisoning an aggregate unnoticed.
  *
  * Modes: truncate a data chunk, scribble garbage over a data chunk,
  * delete a data chunk (legal -> fill), truncate a coordinate array
  * (metadata/shape mismatch), corrupt the array JSON, delete the
  * array JSON, declare a shape longer than the coordinate data.
  */
class ZarrCorruptionPropSpec extends AnyFunSuite {
  import TestSession._

  private def build(nOuter: Int, nInner: Int, chunkOuter: Int,
                    compressor: String, shardInner: Int): (String, Seq[Seq[Any]]) = {
    import spark.implicits._
    val df = (0 until nOuter).flatMap(t => (0 until nInner).map(x =>
      (t.toLong, x.toLong, (t * 13 + x).toDouble))).toDF("t", "x", "v")
    val out = Files.createTempDirectory("zarr_corrupt").resolve("s.zarr").toString
    var w = df.write.format("zarr").option("coords", "t,x")
      .option("chunkOuter", chunkOuter.toString)
    w = if (shardInner > 0)
      w.option("zarrVersion", "3").option("shardInner", shardInner.toString)
        .option("shardCompress", compressor)
    else w.option("compressor", compressor)
    w.mode("overwrite").save(out)
    (out, df.orderBy("t", "x").collect().map(_.toSeq).toSeq)
  }

  private def dataChunks(store: String): Seq[Path] = {
    // v2 chunks sit directly under v/ ("0.0"); v3 sharded chunks nest
    // under v/c/<outer>/<inner>. Walk, keep regular non-meta files.
    val b = scala.collection.mutable.Buffer[Path]()
    Files.walk(Paths.get(store, "v")).forEach { p =>
      val name = p.getFileName.toString
      if (Files.isRegularFile(p) && !name.startsWith(".") && name != "zarr.json") b += p
    }
    b.toSeq.sortBy(_.toString)
  }

  /** Outer chunk index of a chunk file, from its path relative to the
    * array dir: "3.0" (v2) or "c/3/0" (v3). */
  private def outerIdx(store: String, target: Path): Int =
    Paths.get(store, "v").relativize(target).toString
      .split("[./\\\\]").filter(s2 => s2.nonEmpty && s2 != "c").head.toInt

  private def chain(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).getOrElse("") +: chain(t.getCause)

  private val genCase = for {
    nOuter <- Gen.choose(2, 6)
    nInner <- Gen.choose(1, 4)
    chunkOuter <- Gen.choose(1, 3)
    compressor <- Gen.oneOf("none", "zstd", "blosc")
    mode <- Gen.choose(0, 6)
    victim <- Gen.choose(0, 100) // picks the chunk, modulo the count
    shardInner <- Gen.oneOf(0, 0, 1) // 1/3 of cases: v3 sharded store
  } yield (nOuter, nInner, chunkOuter, compressor, mode, victim, shardInner)

  test("every corruption either fails loudly with context or reads as legal fill") {
    // forAllNoShrink: shrinking would walk outside the generator's
    // constraints (mode -1, zero-sized grids)
    val prop = Prop.forAllNoShrink(genCase) {
      case (nOuter, nInner, chunkOuter, compressor, mode0, victim, shardInner) =>
        val mode = mode0
        val v3 = shardInner > 0
        val (store, truth) = build(nOuter, nInner, chunkOuter, compressor, shardInner)
        // The sink writes consolidated metadata (v2 .zmetadata; v3
        // embeds it in the root zarr.json), which is authoritative for
        // schema — per-array JSON corruption would never be consulted.
        // Strip it so the walked per-array path (the one external
        // stores without consolidation use) is what the metadata modes
        // exercise.
        if (mode >= 3 && !v3) Files.delete(Paths.get(store, ".zmetadata"))
        if (mode >= 3 && v3) {
          val root = Paths.get(store, "zarr.json")
          val m = new com.fasterxml.jackson.databind.ObjectMapper()
          val node = m.readTree(Files.readAllBytes(root))
            .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          node.remove("consolidated_metadata")
          Files.write(root, m.writeValueAsBytes(node))
        }
        def arrayJson(arr: String) =
          Paths.get(store, arr, if (v3) "zarr.json" else ".zarray")
        def coordChunk0 = Paths.get(store, "t", if (v3) "c/0" else "0")
        val chunks = dataChunks(store)
        val target = chunks(victim % chunks.size)
        var fillLegal = false // mode leaves a LEGAL store (absent chunk)
        mode match {
          case 0 => Files.write(target, Array[Byte](1, 2, 3)) // truncated chunk
          case 1 => // garbage of plausible length
            Files.write(target, Array.fill[Byte](Files.size(target).toInt)(0x5a))
          case 2 => Files.delete(target); fillLegal = true
          case 3 => // truncate the outer coordinate array data: drop
            // the last byte, a real corruption at ANY chunk grain
            // (the chunk-grain fresh layout makes chunk 0 as small as
            // 8 bytes, so a fixed "keep 8 bytes" cut can be a no-op)
            val t = coordChunk0
            val bytes = Files.readAllBytes(t)
            Files.write(t, java.util.Arrays.copyOf(bytes, bytes.length - 1))
          case 4 => // corrupt the variable's array JSON
            Files.write(arrayJson("v"), "{not json".getBytes)
          case 5 => // delete the variable's array JSON
            Files.delete(arrayJson("v"))
          case _ => // shape claims more rows than the coordinate data has
            val p = arrayJson("t")
            val j = new String(Files.readAllBytes(p), "UTF-8")
            Files.write(p, j.replaceFirst(""""shape":\[\d+\]""",
              s""""shape":[${nOuter + 64}]""").getBytes)
        }
        val attempt = scala.util.Try {
          val d = spark.read.format("zarr").load(store)
          (d.columns.toSeq, d.orderBy("t", "x").collect().map(_.toSeq).toSeq)
        }
        attempt match {
          case scala.util.Success((cols, rows)) if mode == 5 =>
            // deleting v/.zarray leaves a VALID store without that
            // array: schema inference must drop v and keep the
            // coordinate grid intact — legal store evolution, not a
            // silent wrong answer
            val gridOk = !cols.contains("v") && rows.size == truth.size &&
              rows.zip(truth).forall { case (r, tr) => r(0) == tr(0) && r(1) == tr(1) }
            Prop(gridOk) :| s"v survived deletion or grid changed: cols=$cols rows=${rows.size}"
          case scala.util.Success((_, rows)) if fillLegal =>
            // deleted chunk: exactly that chunk's cells read as the
            // store's declared fill (0.0 here; null under fill->null
            // stores); the grid and every other cell stay intact. A
            // cell whose true value EQUALS the fill is indistinguishable,
            // so the changed count may undershoot by those collisions.
            // the victim may be the partial edge chunk
            val k = outerIdx(store, target)
            val chunkCells = math.min(chunkOuter, nOuter - k * chunkOuter) * nInner
            val fillOk = rows.size == truth.size &&
              rows.zip(truth).forall { case (r, tr) =>
                r(0) == tr(0) && r(1) == tr(1) &&
                  (r(2) == tr(2) || r(2) == 0.0 || r(2) == null)
              }
            val changed = rows.zip(truth).count { case (r, tr) => r(2) != tr(2) }
            Prop(fillOk && changed <= chunkCells &&
              changed >= chunkCells - 1 && changed < truth.size) :|
              s"fill read wrong: changed=$changed of ${truth.size} (chunk=$chunkCells)"
          case scala.util.Success((_, rows)) if mode == 1 =>
            // garbage that decodes by construction (uncompressed store:
            // 0x5a bytes ARE a valid slab) must still keep the GRID
            // intact — only the corrupted chunk's values differ
            val gridOk = rows.size == truth.size &&
              rows.zip(truth).forall { case (r, tr) => r(0) == tr(0) && r(1) == tr(1) }
            Prop(compressor == "none" && gridOk) :|
              s"garbage chunk decoded on compressor=$compressor (size=${rows.size})"
          case scala.util.Success((_, rows)) =>
            Prop(false) :| s"corruption mode $mode read ${rows.size} rows silently"
          case scala.util.Failure(e) =>
            val msgs = chain(e)
            // loud AND locatable: some frame names the CONCRETE victim
            // — this store's path or an object key under the victim
            // array ("v/..") — not just generic wording ("zarr",
            // "chunk") that any exception from this codebase carries
            val located = msgs.exists(m =>
              m != null && (m.contains(store) || m.contains("v/")))
            Prop(located) :| s"undescriptive failure: ${msgs.take(3).mkString(" | ")}"
        }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }
}
