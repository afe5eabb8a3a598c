package graft.sources.zarr

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed Zarr v2 store writer — the sink the reference lists as
  * roadmap ("output formats", /root/reference/README.md:305). Writes a
  * complete-grid DataFrame (coordinate columns + data-variable
  * columns) as a Zarr v2 store: coordinates as 1-D arrays, variables
  * chunked `(chunkOuter, full inner dims)` like the reference fixtures.
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
  * (0). Local filesystem paths (executors write with java.nio).
  */
object ZarrWriter {

  private def dtypeOf(t: DataType): (String, Int) = t match {
    case LongType => ("<i8", 8)
    case IntegerType => ("<i4", 4)
    case ShortType => ("<i2", 2)
    case ByteType => ("|i1", 1)
    case DoubleType => ("<f8", 8)
    case FloatType => ("<f4", 4)
    case BooleanType => ("|b1", 1)
    case other => throw new IllegalArgumentException(s"Unsupported Zarr write type: $other")
  }

  private def zarray(shape: Seq[Long], chunks: Seq[Int], dtype: String): String =
    s"""{"zarr_format":2,"shape":[${shape.mkString(",")}],"chunks":[${chunks.mkString(",")}],
       |"dtype":"$dtype","fill_value":0,"order":"C","filters":null,
       |"dimension_separator":".","compressor":null}""".stripMargin.replace("\n", "")

  private def putValue(buf: ByteBuffer, offset: Int, elem: Int, t: DataType, v: Any): Unit =
    t match {
      case LongType => buf.putLong(offset * elem, v.asInstanceOf[Long])
      case IntegerType => buf.putInt(offset * elem, v.asInstanceOf[Int])
      case ShortType => buf.putShort(offset * elem, v.asInstanceOf[Short])
      case ByteType => buf.put(offset * elem, v.asInstanceOf[Byte])
      case DoubleType => buf.putDouble(offset * elem, v.asInstanceOf[Double])
      case FloatType => buf.putFloat(offset * elem, v.asInstanceOf[Float])
      case BooleanType => buf.put(offset * elem, if (v.asInstanceOf[Boolean]) 1.toByte else 0.toByte)
      case other => throw new IllegalArgumentException(other.toString)
    }

  /** Write `df` as a Zarr v2 store at `path` (created fresh).
    *
    * @param coords coordinate column names, outer dimension first
    * @param chunkOuter chunk extent along the outer dimension
    */
  def write(df: DataFrame, path: String, coords: Seq[String], chunkOuter: Int = 1): Unit = {
    require(coords.nonEmpty, "at least one coordinate column")
    val schema = df.schema
    val varCols = schema.fieldNames.filterNot(coords.contains).toSeq
    require(varCols.nonEmpty, "at least one data-variable column")

    // 1. coordinate values (small, driver-side), sorted ascending
    val coordVals: Seq[Array[Any]] = coords.map { c =>
      df.select(col(c)).distinct().orderBy(col(c)).collect().map(_.get(0))
    }
    val shape = coordVals.map(_.length.toLong)
    val totalRows = shape.product
    val n = df.count()
    require(n <= totalRows,
      s"input has $n rows but the coordinate grid only has $totalRows cells (duplicates?)")

    // 2. driver writes group + coordinate arrays + variable metadata
    val root = Paths.get(path)
    Files.createDirectories(root)
    Files.write(root.resolve(".zgroup"), """{"zarr_format":2}""".getBytes)
    // Column metadata (units, long_name, … — e.g. from a zarr read)
    // round-trips as the array's .zattrs.
    def writeAttrs(dir: java.nio.file.Path, name: String): Unit = {
      val md = schema(name).metadata
      if (md != org.apache.spark.sql.types.Metadata.empty)
        Files.write(dir.resolve(".zattrs"), md.json.getBytes)
    }
    coords.zip(coordVals).zipWithIndex.foreach { case ((name, vals), i) =>
      val t = schema(name).dataType
      val (dt, elem) = dtypeOf(t)
      val dir = root.resolve(name)
      Files.createDirectories(dir)
      Files.write(dir.resolve(".zarray"),
        zarray(Seq(vals.length.toLong), Seq(vals.length), dt).getBytes)
      writeAttrs(dir, name)
      val buf = ByteBuffer.allocate(vals.length * elem).order(ByteOrder.LITTLE_ENDIAN)
      vals.zipWithIndex.foreach { case (v, j) => putValue(buf, j, elem, t, v) }
      Files.write(dir.resolve("0"), buf.array())
    }
    val innerShape = shape.drop(1).map(_.toInt)
    val chunkShape = chunkOuter +: innerShape
    varCols.foreach { name =>
      val (dt, _) = dtypeOf(schema(name).dataType)
      val dir = root.resolve(name)
      Files.createDirectories(dir)
      Files.write(dir.resolve(".zarray"), zarray(shape, chunkShape, dt).getBytes)
      writeAttrs(dir, name)
    }

    // 3. executors write chunk slabs: repartition by outer-chunk id so
    // each chunk's rows land in exactly one task
    val idxMaps: Seq[Map[Any, Int]] =
      coordVals.map(_.zipWithIndex.toMap)
    val innerRows = innerShape.map(_.toLong).product
    val spark = df.sparkSession
    val bIdx = spark.sparkContext.broadcast(idxMaps)
    val varTypes = varCols.map(schema(_).dataType)
    val nOuterChunks = ((shape.head + chunkOuter - 1) / chunkOuter).toInt

    val outerName = coords.head
    val chunkIdCol = udfFreeChunkId(df, outerName, idxMaps.head, chunkOuter)
    val rows = df.withColumn("__chunk", chunkIdCol)
      .repartition(math.min(nOuterChunks, math.max(1, spark.sparkContext.defaultParallelism)),
        col("__chunk"))

    val coordNames = coords
    rows.foreachPartition { it: Iterator[Row] =>
      val idx = bIdx.value
      val buffers = scala.collection.mutable.Map.empty[(Int, Int), ByteBuffer] // (chunk, var)
      def bufFor(chunk: Int, v: Int): ByteBuffer =
        buffers.getOrElseUpdate((chunk, v), {
          // Zarr v2 edge chunks are stored at FULL chunk shape (the
          // overhang is fill padding) — readers size buffers from the
          // chunk shape, not the array shape
          val (_, elem) = dtypeOf(varTypes(v))
          ByteBuffer.allocate((chunkOuter * innerRows).toInt * elem)
            .order(ByteOrder.LITTLE_ENDIAN)
        })
      it.foreach { row =>
        val outerIdx = idx.head(row.getAs[Any](coordNames.head))
        val chunk = outerIdx / chunkOuter
        var inner = 0L
        var d = 1
        while (d < coordNames.length) {
          inner = inner * idx(d).size + idx(d)(row.getAs[Any](coordNames(d)))
          d += 1
        }
        val local = (outerIdx - chunk * chunkOuter) * innerRows + inner
        var v = 0
        while (v < varCols.length) {
          val (_, elem) = dtypeOf(varTypes(v))
          putValue(bufFor(chunk, v), local.toInt, elem, varTypes(v), row.getAs[Any](varCols(v)))
          v += 1
        }
      }
      buffers.foreach { case ((chunk, v), buf) =>
        val key = (chunk.toString +: Seq.fill(coordNames.length - 1)("0")).mkString(".")
        Files.write(Paths.get(path, varCols(v), key), buf.array())
      }
    }
  }

  /** Chunk id column without a UDF: a chained CASE over the (small)
    * outer coordinate values, entirely codegen'd. */
  private def udfFreeChunkId(df: DataFrame, outer: String,
      idx: Map[Any, Int], chunkOuter: Int): org.apache.spark.sql.Column = {
    idx.toSeq.sortBy(_._2).foldLeft(lit(-1)) { case (acc, (value, i)) =>
      when(col(outer) === lit(value), lit(i / chunkOuter)).otherwise(acc)
    }
  }
}
