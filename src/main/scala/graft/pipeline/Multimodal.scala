package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Tables

/** One simulated media item: opaque binary payload + typed metadata —
  * the schema shape a multimodal corpus table uses at scale
  * (image/audio/video bytes live in `payload`, never parsed by the
  * relational layer). */
case class MediaItem(
    doc_id: Long,
    format: String,
    declared_size: Long,
    payload: Array[Byte])

/** Decoded features for one media item (the output batch shape of the
  * decode stage). */
case class MediaFeatures(
    doc_id: Long,
    format: String,
    width: Int,
    height: Int,
    n_frames: Int,
    byte_entropy_q: Double,
    histogram: Array[Double])

/** Multimodal-column plumbing: treat media as opaque `binary` columns
  * with typed metadata, and run decode / feature-extract /
  * frame-sample as a partition-wise batch stage.
  *
  * The real decode (image/audio codecs) is STUBBED — this container
  * has no media libraries — with [[decodeStub]], a deterministic fake
  * that derives plausible dimensions and features purely from the
  * bytes. Everything around the stub is real, scale-shaped Spark:
  * typed `Dataset[MediaItem]`, `mapPartitions` batching (one decoder
  * init per partition, the same shape a native decoder or an Arrow
  * batch UDF needs), and a columnar feature output schema.
  *
  * Every stage has a FULL DuckDB oracle: the fixture payload is the
  * utf8 bytes of ASCII text, so the byte arithmetic the stub performs
  * (header byte, length, 8-bin byte histogram, entropy) mirrors
  * exactly in SQL over `ascii(substring(text, i, 1))` — the oracle
  * recomputes the decode, and the compare hash-matches it. A real
  * binary codec would drop the oracle back to a rows-only check.
  */
object Multimodal {

  /** Deterministic fake decoder. A real implementation would replace
    * exactly this function (signature and batch shape unchanged) with
    * e.g. a JNI image codec; `???` marker intentionally documented. */
  def decodeStub(item: MediaItem): MediaFeatures = {
    val bytes = item.payload
    val n = bytes.length max 1
    // fake dimensions derived from content, as a codec would parse a header
    val width = 16 + (math.abs(bytes.headOption.getOrElse(0: Byte).toInt) % 64)
    val height = 16 + (n % 64)
    // "frame sampling": one frame per 256-byte window, stride 128
    val frames = if (n < 256) 1 else 1 + (n - 256) / 128
    // 8-bin byte histogram, normalized — stands in for a feature vector
    val hist = new Array[Double](8)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) / 32) += 1.0; i += 1 }
    var j = 0
    while (j < 8) { hist(j) /= n; j += 1 }
    val entropyQ = hist.map(p => if (p > 0) -p * math.log(p) else 0.0).sum
    MediaFeatures(item.doc_id, item.format, width, height, frames, entropyQ, hist)
  }

  /** documents → simulated media table: payload = utf8 bytes of the
    * text (stands in for image/audio bytes), metadata from the real
    * columns. */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaItem] = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source").as("format"),
        col("n_chars").as("declared_size"), col("text").cast("binary").as("payload"))
      .as[MediaItem]
  }

  /** The decode/feature-extract stage: partition-wise batch map. One
    * decoder "initialization" per partition (here: trivial), then a
    * streaming map over the partition's items — the canonical shape
    * for wrapping native decoders without per-row init cost. */
  def decodeFeatures(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      // per-partition decoder init would go here
      it.map(decodeStub)
    }
  }

  /** Query entry: decoded features flattened to a stable column set. */
  def m1_multimodal_decode(s: SparkSession, dir: String): DataFrame =
    decodeFeatures(mediaTable(s, dir))
      .toDF()
      .select(col("doc_id"), col("format"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("n_frames").cast("long").as("n_frames"),
        // rounded so JVM-libm vs DuckDB-libm log() ulp differences
        // cannot break the hash compare
        round(col("byte_entropy_q"), 6).as("byte_entropy_q"),
        round(element_at(col("histogram"), 1), 6).as("hist_0"),
        round(element_at(col("histogram"), 4), 6).as("hist_3"))

  /** Frame sampling as pure relational ops: slice the payload into
    * fixed windows with `substring` over binary — shows the payload
    * column also composes with builtin functions (no decode). */
  def m2_multimodal_frames(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir).toDF()
      .select(col("doc_id"),
        explode(sequence(lit(0L),
          greatest(expr("(length(payload) - 256) div 128"), lit(0L)))).as("frame_id"),
        col("payload"))
      .select(col("doc_id"), col("frame_id"),
        length(expr("substring(payload, frame_id * 128 + 1, 256)")).cast("long").as("frame_bytes"))

  /** The payload is the utf8 bytes of ascii text, so DuckDB mirrors
    * the binary slicing with text substring — byte counts match. */
  private val m2Sql = """
    SELECT doc_id, frame_id,
      CAST(LENGTH(SUBSTRING(text, CAST(frame_id * 128 + 1 AS INT), 256)) AS BIGINT) AS frame_bytes
    FROM (SELECT doc_id, text,
            UNNEST(range(0, GREATEST((LENGTH(text) - 256) // 128, 0) + 1)) AS frame_id
          FROM documents) src"""

  /** The resize stage: downsample each decoded item to a fixed target
    * (here 2× box downscale of the fake dimensions + 8→4 average-pooled
    * feature bins — a real implementation swaps the pooling body for a
    * pixel resampler, batch shape unchanged). Runs as the same
    * partition-wise typed map as the decoder, so decode→resize chains
    * without an intermediate shuffle. */
  def m3_multimodal_resize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    decodeFeatures(mediaTable(s, dir))
      .mapPartitions { it =>
        it.map { f =>
          val pooled = Array.tabulate(4)(b => (f.histogram(2 * b) + f.histogram(2 * b + 1)) / 2.0)
          (f.doc_id, f.width / 2, f.height / 2, pooled)
        }
      }
      .toDF("doc_id", "thumb_w", "thumb_h", "pooled")
      .select(col("doc_id"),
        col("thumb_w").cast("long").as("thumb_w"),
        col("thumb_h").cast("long").as("thumb_h"),
        round(element_at(col("pooled"), 1), 6).as("pool_0"),
        round(element_at(col("pooled"), 4), 6).as("pool_3"))
  }

  /** Audio-shaped stage: treat the payload as 8-bit PCM samples and
    * compute per-window signal statistics (energy = Σ sample², peak)
    * over fixed 256-sample windows — the "resample/feature-extract
    * audio" step of a multimodal pipeline. Same partition-wise typed
    * map as the decoder (a real codec swaps the byte-indexing body,
    * batch shape unchanged); integer arithmetic end to end, and since
    * the fixture payload is ASCII text bytes, DuckDB mirrors it
    * exactly with ascii(substring) — this op has a FULL oracle, not a
    * rows-only check. */
  def m4_multimodal_audio(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir)
      .mapPartitions { it =>
        it.flatMap { item =>
          val b = item.payload
          if (b.isEmpty) Iterator.empty
          else {
            val nW = (b.length + 255) / 256
            (0 until nW).iterator.map { w =>
              val start = w * 256
              val end = math.min(start + 256, b.length)
              var energy = 0L
              var peak = 0L
              var i = start
              while (i < end) {
                val v = (b(i) & 0xff).toLong
                energy += v * v
                if (v > peak) peak = v
                i += 1
              }
              (item.doc_id, w.toLong, (end - start).toLong, energy, peak)
            }
          }
        }
      }
      .toDF("doc_id", "window_id", "n_samples", "energy", "peak")
  }

  private val m4Sql = """
    WITH d AS (
      SELECT doc_id, text, LENGTH(text) AS len FROM documents WHERE LENGTH(text) > 0),
    w AS (
      SELECT doc_id, text, len, UNNEST(range((len + 255) // 256)) AS window_id FROM d),
    c AS (
      SELECT doc_id, window_id,
        LEAST(len - window_id * 256, 256) AS n_samples,
        UNNEST(range(LEAST(len - window_id * 256, 256))) AS j,
        window_id * 256 AS base, text
      FROM w),
    sv AS (
      SELECT doc_id, window_id, n_samples,
        ascii(substring(text, CAST(base + j + 1 AS INT), 1)) AS av
      FROM c)
    SELECT doc_id, CAST(window_id AS BIGINT) AS window_id,
      CAST(n_samples AS BIGINT) AS n_samples,
      CAST(SUM(av * av) AS BIGINT) AS energy,
      CAST(MAX(av) AS BIGINT) AS peak
    FROM sv GROUP BY 1, 2, 3"""

  /** Leading-frame fingerprint duplicates — the media-dedup stage of
    * a multimodal pipeline: two items whose FIRST FRAME is
    * byte-identical (same thumbnail, same video opening, same audio
    * intro) are duplicate candidates regardless of what follows
    * (re-encodes that truncate/extend, stitched compilations). The
    * frame here is the payload's first 256-byte window (m2/m4's frame
    * geometry); the pair key is its md5 digest — d1's fixed-width
    * digest discipline, so the shuffle key is 16 bytes no matter the
    * frame size.
    *
    * (A first cut bucketed on a quantized byte-HISTOGRAM signature —
    * degenerate: every ASCII-text payload saturates the same two bins,
    * so all C(N,2) pairs matched, and distribution-level features
    * collapse the same way on any monoculture corpus. A content
    * fingerprint is what real image-dedup buckets on; the histogram
    * idea lives on inside d8/d5 where the feature space is real
    * embeddings.)
    *
    * Scale shape: fingerprinting is the same partition-wise typed map
    * as the decoder (no shuffle); pairing groups by digest, and a
    * viral leading frame (a hot digest) tiles through
    * [[Dedup.bucketPairs]] into bounded tasks instead of one
    * quadratic straggler. */
  def m5_multimodal_neardup(s: SparkSession, dir: String): DataFrame = {
    val fp = mediaTable(s, dir).toDF()
      .filter(length(col("payload")) >= 1)
      .select(col("doc_id"), md5(expr("substring(payload, 1, 256)")).as("frame_md5"))
    Dedup.bucketPairs(fp.withColumn("fmd5", col("frame_md5")),
        Seq("frame_md5"), "doc_id", Dedup.d3ChunkSize,
        s"m5:$dir:${Dedup.corpusStamp(s, dir, "documents")}")
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.fmd5").as("frame_md5"))
      .distinct()
  }

  /** DuckDB mirrors the binary first-frame digest with md5 over the
    * text prefix. This leans on the m-family fixture contract (see
    * the object scaladoc): the payload is the utf8 bytes of ASCII
    * text, where byte slicing ≡ character slicing. On a non-ASCII
    * corpus the engine's 256-BYTE slice and this 256-CHARACTER slice
    * would diverge (DuckDB cannot md5 a byte-slice of a BLOB —
    * substring/array-slice don't bind on BLOB), so like a real binary
    * codec that corpus would drop m5 to a rows-only check — the same
    * posture m2/m4 document for their ascii()/substring mirrors. */
  private val m5Sql = """
    WITH fp AS (
      SELECT doc_id, md5(substring(text, 1, 256)) AS frame_md5
      FROM documents WHERE LENGTH(text) >= 1)
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.frame_md5
    FROM fp a JOIN fp b ON a.frame_md5 = b.frame_md5 AND a.doc_id < b.doc_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_multimodal_decode" -> (m1_multimodal_decode _),
    "m2_multimodal_frames" -> (m2_multimodal_frames _),
    "m3_multimodal_resize" -> (m3_multimodal_resize _),
    "m4_multimodal_audio" -> (m4_multimodal_audio _),
    "m5_multimodal_neardup" -> (m5_multimodal_neardup _))

  /** The decode-stub arithmetic recomputed in SQL: per-position byte
    * codes from ascii(substring), 8-bin histogram via conditional
    * counts, entropy as the explicit left-to-right 8-term sum (same
    * double-addition order as the Scala loop). Empty documents keep
    * the n = max(len, 1) convention. */
  private val histBins: String =
    (0 until 8).map(b =>
      s"CAST(COALESCE(SUM(CASE WHEN code // 32 = $b THEN 1 END), 0) AS DOUBLE)" +
        s" / ANY_VALUE(n) AS h$b").mkString(", ")

  private val m1Sql = s"""
    WITH src AS (
      SELECT doc_id, source AS format, text,
             GREATEST(LENGTH(text), 1) AS n
      FROM documents),
    pos AS (
      SELECT doc_id, n, UNNEST(range(1, LENGTH(text) + 1)) AS i, text
      FROM src),
    codes AS (
      SELECT doc_id, n, ascii(substring(text, CAST(i AS INT), 1)) AS code
      FROM pos),
    hist AS (
      SELECT doc_id, $histBins
      FROM codes GROUP BY doc_id),
    feat AS (
      SELECT s.doc_id, s.format,
        CAST(16 + (CASE WHEN LENGTH(s.text) = 0 THEN 0
                        ELSE ascii(substring(s.text, 1, 1)) END) % 64 AS BIGINT) AS width,
        CAST(16 + s.n % 64 AS BIGINT) AS height,
        CAST(CASE WHEN s.n < 256 THEN 1 ELSE 1 + (s.n - 256) // 128 END AS BIGINT) AS n_frames,
        COALESCE(h.h0, 0) AS h0, COALESCE(h.h1, 0) AS h1,
        COALESCE(h.h2, 0) AS h2, COALESCE(h.h3, 0) AS h3,
        COALESCE(h.h4, 0) AS h4, COALESCE(h.h5, 0) AS h5,
        COALESCE(h.h6, 0) AS h6, COALESCE(h.h7, 0) AS h7
      FROM src s LEFT JOIN hist h ON s.doc_id = h.doc_id)
    SELECT doc_id, format, width, height, n_frames,
      ROUND(${(0 until 8).map(b =>
        s"(CASE WHEN h$b > 0 THEN -h$b * ln(h$b) ELSE 0.0 END)").mkString(" + ")}, 6)
        AS byte_entropy_q,
      ROUND(h0, 6) AS hist_0, ROUND(h3, 6) AS hist_3
    FROM feat"""

  private val m3Sql = s"""
    WITH src AS (
      SELECT doc_id, text, GREATEST(LENGTH(text), 1) AS n
      FROM documents),
    pos AS (
      SELECT doc_id, n, UNNEST(range(1, LENGTH(text) + 1)) AS i, text
      FROM src),
    codes AS (
      SELECT doc_id, n, ascii(substring(text, CAST(i AS INT), 1)) AS code
      FROM pos),
    hist AS (
      SELECT doc_id, $histBins
      FROM codes GROUP BY doc_id)
    SELECT s.doc_id,
      CAST((16 + (CASE WHEN LENGTH(s.text) = 0 THEN 0
                       ELSE ascii(substring(s.text, 1, 1)) END) % 64) // 2 AS BIGINT) AS thumb_w,
      CAST((16 + s.n % 64) // 2 AS BIGINT) AS thumb_h,
      ROUND((COALESCE(h.h0, 0) + COALESCE(h.h1, 0)) / 2, 6) AS pool_0,
      ROUND((COALESCE(h.h6, 0) + COALESCE(h.h7, 0)) / 2, 6) AS pool_3
    FROM src s LEFT JOIN hist h ON s.doc_id = h.doc_id"""

  val oracle: Map[String, String] = Map(
    "m1_multimodal_decode" -> m1Sql,
    "m2_multimodal_frames" -> m2Sql,
    "m3_multimodal_resize" -> m3Sql,
    "m4_multimodal_audio" -> m4Sql,
    "m5_multimodal_neardup" -> m5Sql)
}
