package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.zarr.{HadoopStore, LocalStore, ZarrStore}

/** The Hadoop-FS store must behave identically to the java.nio local
  * store (exercised offline via Hadoop's LocalFileSystem on file://
  * URIs — the same code path serves s3a:// / gs:// / hdfs:// on a
  * cluster). */
class ZarrStoreSpec extends AnyFunSuite {

  private val abs = new java.io.File("src/test/resources/zarr/synthetic_v3.zarr").getAbsolutePath
  private val local = LocalStore(abs)
  private val hadoop = HadoopStore(s"file://$abs")

  test("scheme dispatch") {
    assert(ZarrStore.open(abs).isInstanceOf[LocalStore])
    assert(ZarrStore.open(s"file://$abs").isInstanceOf[LocalStore])
    assert(ZarrStore.open(s"hdfs://nn/$abs").isInstanceOf[HadoopStore])
    assert(ZarrStore.open(s"s3a://bucket/store.zarr").isInstanceOf[HadoopStore])
  }

  test("listDirs identical") {
    assert(hadoop.listDirs() == local.listDirs())
    assert(local.listDirs() == Seq("humidity", "lat", "lon", "temperature", "time"))
  }

  test("readBytes identical (metadata and chunk files)") {
    for (rel <- Seq("zarr.json", "time/zarr.json", "temperature/c/0/0/0")) {
      val a = local.readBytes(rel)
      val b = hadoop.readBytes(rel)
      assert(a.isDefined && b.isDefined)
      assert(a.get.sameElements(b.get), s"$rel differs")
    }
    assert(local.readBytes("nope").isEmpty && hadoop.readBytes("nope").isEmpty)
  }

  test("sizeOf identical") {
    for (rel <- Seq("zarr.json", "temperature/c/3/0/0"))
      assert(local.sizeOf(rel) == hadoop.sizeOf(rel))
  }

  test("mapBytes: big files memory-map, small files read plainly, bytes identical") {
    // small chunk: below the 1 MB threshold → plain read (mappings
    // unmap only at GC; tiny chunks must not consume map slots)
    val rel = "temperature/c/0/0/0"
    val small = local.mapBytes(rel).get
    assert(!small.isInstanceOf[java.nio.MappedByteBuffer], small.getClass)
    val plain = local.readBytes(rel).get
    val viaSmall = new Array[Byte](small.remaining())
    small.get(viaSmall)
    assert(viaSmall.sameElements(plain))
    // big file: mapped
    val dir = java.nio.file.Files.createTempDirectory("zarr_map")
    val big = new Array[Byte](1 << 21)
    java.util.Arrays.fill(big, 42.toByte)
    java.nio.file.Files.write(dir.resolve("bigchunk"), big)
    val ls = graft.sources.zarr.LocalStore(dir.toString)
    val mapped = ls.mapBytes("bigchunk").get
    assert(mapped.isInstanceOf[java.nio.MappedByteBuffer], mapped.getClass)
    assert(mapped.remaining() == big.length && mapped.get(0) == 42.toByte)
    // default (non-mappable backends): a wrapped plain read
    assert(hadoop.mapBytes(rel).exists(_.remaining() == plain.length))
    assert(local.mapBytes("nope").isEmpty)
  }

  test("stores serialize (cross the driver-executor boundary)") {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(hadoop); oos.writeObject(local); oos.close()
    val ois = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    val h2 = ois.readObject().asInstanceOf[HadoopStore]
    val l2 = ois.readObject().asInstanceOf[LocalStore]
    assert(h2.listDirs() == l2.listDirs())
  }
}
