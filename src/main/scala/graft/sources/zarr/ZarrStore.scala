package graft.sources.zarr

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Storage abstraction for a Zarr store: directory listing + file
  * reads, with implementations for plain local paths (java.nio, the
  * fast path) and any Hadoop FileSystem URI (`file://`, `hdfs://`,
  * `s3a://`, `gs://` …) — the rebuild of the reference's storage
  * backend dispatch (/root/reference/src/reader/storage.rs:63-188),
  * except Spark's Hadoop connector ecosystem supplies every remote
  * protocol for free.
  *
  * Instances are cheap descriptors (a path string); filesystem handles
  * are opened lazily, so a ZarrStore can cross the driver→executor
  * boundary inside an InputPartition.
  */
sealed trait ZarrStore extends Serializable {
  def path: String
  /** Names of immediate subdirectories (candidate arrays). */
  def listDirs(): Seq[String]
  /** Full contents of `rel` (relative to the store root), or None if
    * the file does not exist (absent chunk ⇒ fill_value). */
  def readBytes(rel: String): Option[Array[Byte]]
  /** Size in bytes of `rel` if it exists (IO accounting). */
  def sizeOf(rel: String): Option[Long]
  /** Write the full contents of `rel`, creating parent directories as
    * needed (sink path — works for any writable backend, so
    * `df.write.format("zarr")` targets hdfs://, s3a://, … the same way
    * it targets local paths). */
  def writeBytes(rel: String, data: Array[Byte]): Unit
  /** Rename this store's root directory to `destPath` (same
    * filesystem). Used by the sink's write-to-temp-then-swap commit. */
  def moveTo(destPath: String): Unit
  /** Remove the store directory and everything under it (sink
    * overwrite). No-op if absent. Also drops any decoded chunks cached
    * for this path in this JVM. */
  def deleteRecursively(): Unit
}

object ZarrStore {
  /** Scheme dispatch: `http(s)://` uses the JDK HttpClient (read-only,
    * consolidated-metadata stores — plain HTTP cannot list), other
    * non-`file` schemes go through Hadoop; plain paths and `file:`
    * use java.nio directly. */
  def open(pathStr: String): ZarrStore = {
    val schemeEnd = pathStr.indexOf("://")
    if (pathStr.startsWith("file:"))
      LocalStore(Paths.get(java.net.URI.create(pathStr)).toString)
    else if (pathStr.startsWith("http://") || pathStr.startsWith("https://"))
      HttpStore(pathStr.stripSuffix("/"))
    else if (schemeEnd > 0) HadoopStore(pathStr)
    else LocalStore(pathStr)
  }
}

final case class LocalStore(path: String) extends ZarrStore {
  @transient private lazy val root: Path = Paths.get(path)

  override def listDirs(): Seq[String] = {
    if (!Files.isDirectory(root))
      throw new IllegalArgumentException(s"Not a directory: $path")
    val s = Files.list(root)
    try s.iterator().asScala.filter(Files.isDirectory(_))
      .map(_.getFileName.toString).toSeq.sorted
    finally s.close()
  }

  override def readBytes(rel: String): Option[Array[Byte]] = {
    val p = root.resolve(rel)
    if (Files.exists(p)) Some(Files.readAllBytes(p)) else None
  }

  override def sizeOf(rel: String): Option[Long] = {
    val p = root.resolve(rel)
    if (Files.exists(p)) Some(Files.size(p)) else None
  }

  override def writeBytes(rel: String, data: Array[Byte]): Unit = {
    val p = root.resolve(rel)
    Files.createDirectories(p.getParent)
    Files.write(p, data)
  }

  override def moveTo(destPath: String): Unit = {
    // normalize through the dispatcher: `file:` URIs (e.g. from
    // V2SessionCatalog table specs) must resolve to a local path, not
    // a literal "./file:" directory
    val dest = ZarrStore.open(destPath) match {
      case LocalStore(p) => Paths.get(p)
      case other => throw new IllegalArgumentException(
        s"Cannot move local store $path to non-local target $destPath")
    }
    Option(dest.getParent).foreach(Files.createDirectories(_))
    Files.move(root, dest)
    // cache keys hold the NORMALIZED path (ZarrStore.open(...).path)
    ChunkIO.invalidatePath(dest.toString)
  }

  override def deleteRecursively(): Unit = {
    if (Files.exists(root)) {
      val s = Files.walk(root)
      try s.sorted(java.util.Comparator.reverseOrder[Path]())
        .iterator().asScala.foreach(Files.delete)
      finally s.close()
    }
    ChunkIO.invalidatePath(path)
  }
}

final case class HadoopStore(path: String) extends ZarrStore {
  import org.apache.hadoop.fs.{FileSystem, Path => HPath}

  @transient private lazy val root = new HPath(path)
  @transient private lazy val fs: FileSystem =
    root.getFileSystem(new org.apache.hadoop.conf.Configuration())

  override def listDirs(): Seq[String] = {
    if (!fs.getFileStatus(root).isDirectory)
      throw new IllegalArgumentException(s"Not a directory: $path")
    fs.listStatus(root).filter(_.isDirectory).map(_.getPath.getName).toSeq.sorted
  }

  override def readBytes(rel: String): Option[Array[Byte]] = {
    val p = new HPath(root, rel)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(org.apache.commons.io.IOUtils.toByteArray(in)) finally in.close()
    }
  }

  override def sizeOf(rel: String): Option[Long] = {
    val p = new HPath(root, rel)
    if (fs.exists(p)) Some(fs.getFileStatus(p).getLen) else None
  }

  override def writeBytes(rel: String, data: Array[Byte]): Unit = {
    val out = fs.create(new HPath(root, rel), true) // creates parent dirs
    try out.write(data) finally out.close()
  }

  override def moveTo(destPath: String): Unit = {
    val dest = new HPath(destPath)
    Option(dest.getParent).foreach(fs.mkdirs)
    if (!fs.rename(root, dest))
      throw new java.io.IOException(s"Failed to rename $path to $destPath")
    ChunkIO.invalidatePath(destPath)
  }

  override def deleteRecursively(): Unit = {
    if (fs.exists(root)) fs.delete(root, true)
    ChunkIO.invalidatePath(path)
  }
}

/** Read-only Zarr store over plain HTTP(S) — the reference's roadmap
  * "HTTP backend" (README.md:289-337). Plain HTTP has no directory
  * listing, so discovery requires consolidated metadata (`.zmetadata`,
  * one GET) or a root `zarr.json`; chunk reads are ranged to whole
  * objects (one GET each). Executors open their own clients lazily —
  * the store crosses the wire as just the URL. */
final case class HttpStore(path: String) extends ZarrStore {
  import java.net.http.{HttpClient, HttpRequest, HttpResponse}

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder()
      .followRedirects(HttpClient.Redirect.NORMAL)
      .build()

  private def uri(rel: String) = java.net.URI.create(s"$path/$rel")

  override def listDirs(): Seq[String] =
    throw new UnsupportedOperationException(
      s"HTTP Zarr stores cannot list directories; publish consolidated metadata " +
        s"(.zmetadata) at $path")

  override def readBytes(rel: String): Option[Array[Byte]] = {
    val resp = client.send(
      HttpRequest.newBuilder(uri(rel)).GET().build(),
      HttpResponse.BodyHandlers.ofByteArray())
    if (resp.statusCode() == 200) Some(resp.body())
    else if (resp.statusCode() == 404) None
    else throw new java.io.IOException(
      s"HTTP ${resp.statusCode()} reading ${uri(rel)}")
  }

  override def sizeOf(rel: String): Option[Long] = {
    val resp = client.send(
      HttpRequest.newBuilder(uri(rel))
        .method("HEAD", HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.discarding())
    if (resp.statusCode() == 200) {
      val l = resp.headers().firstValueAsLong("Content-Length")
      Some(if (l.isPresent) l.getAsLong else 0L)
    } else if (resp.statusCode() == 404) None
    else throw new java.io.IOException(
      s"HTTP ${resp.statusCode()} probing ${uri(rel)}") // 5xx is an error, not not-found
  }

  override def writeBytes(rel: String, data: Array[Byte]): Unit =
    throw new UnsupportedOperationException("HTTP Zarr stores are read-only")

  override def moveTo(destPath: String): Unit =
    throw new UnsupportedOperationException("HTTP Zarr stores are read-only")

  override def deleteRecursively(): Unit =
    throw new UnsupportedOperationException("HTTP Zarr stores are read-only")
}
