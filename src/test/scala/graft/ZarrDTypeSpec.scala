package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.zarr.{ChunkCodec, ZarrDType}

/** Dtype parsing + decode edge cases (mirrors the reference's dtype
  * unit tests, /root/reference/src/reader/dtype.rs:89-116, plus the
  * widening rules from SURVEY.md §1.5 "What's hard"). */
class ZarrDTypeSpec extends AnyFunSuite {

  test("v2 dtype strings parse: all kinds, endianness, malformed -> f8") {
    assert(ZarrDType.parseV2("<i8") == ZarrDType('i', 8, littleEndian = true))
    assert(ZarrDType.parseV2(">f4") == ZarrDType('f', 4, littleEndian = false))
    assert(ZarrDType.parseV2("|b1") == ZarrDType('b', 1, littleEndian = true))
    assert(ZarrDType.parseV2("<u2") == ZarrDType('u', 2, littleEndian = true))
    assert(ZarrDType.parseV2("=i4") == ZarrDType('i', 4, littleEndian = true))
    for (bad <- Seq("", "x", "<", "<i", "<q9"))
      assert(ZarrDType.parseV2(bad) == ZarrDType('f', 8, littleEndian = true), s"'$bad'")
  }

  test("v3 names parse") {
    assert(ZarrDType.parseV3("int16", littleEndian = true) == ZarrDType('i', 2, littleEndian = true))
    assert(ZarrDType.parseV3("uint64", littleEndian = true) == ZarrDType('u', 8, littleEndian = true))
    assert(ZarrDType.parseV3("float16", littleEndian = true) == ZarrDType('f', 2, littleEndian = true))
    assert(ZarrDType.parseV3("bool", littleEndian = true) == ZarrDType('b', 1, littleEndian = true))
    assert(ZarrDType.parseV3("mystery", littleEndian = true) == ZarrDType('f', 8, littleEndian = true))
  }

  test("unsigned widening preserves the full value space") {
    // u1 255 -> Short 255; u2 65535 -> Int 65535; u4 4294967295 -> Long
    val u1 = ChunkCodec.decodeTyped(Array(0xff.toByte), ZarrDType('u', 1, littleEndian = true), 1)
    assert(u1.asInstanceOf[Array[Short]](0) == 255)
    val u2 = ChunkCodec.decodeTyped(Array(0xff.toByte, 0xff.toByte),
      ZarrDType('u', 2, littleEndian = true), 1)
    assert(u2.asInstanceOf[Array[Int]](0) == 65535)
    val u4 = ChunkCodec.decodeTyped(Array.fill(4)(0xff.toByte),
      ZarrDType('u', 4, littleEndian = true), 1)
    assert(u4.asInstanceOf[Array[Long]](0) == 4294967295L)
  }

  test("big-endian decode") {
    val be = ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN).putLong(123456789L).array()
    val out = ChunkCodec.decodeTyped(be, ZarrDType('i', 8, littleEndian = false), 1)
    assert(out.asInstanceOf[Array[Long]](0) == 123456789L)
  }

  test("half-float conversion: exact values, subnormals, specials") {
    assert(ChunkCodec.halfToFloat(0x3c00.toShort) == 1.0f)
    assert(ChunkCodec.halfToFloat(0xc000.toShort) == -2.0f)
    assert(ChunkCodec.halfToFloat(0x7bff.toShort) == 65504.0f) // max half
    assert(ChunkCodec.halfToFloat(0x0001.toShort) == math.pow(2, -24).toFloat) // min subnormal
    assert(ChunkCodec.halfToFloat(0x0000.toShort) == 0.0f)
    assert(ChunkCodec.halfToFloat(0x7c00.toShort).isPosInfinity)
    assert(ChunkCodec.halfToFloat(0x7e00.toShort).isNaN)
  }

  test("bool decode: any nonzero byte is true") {
    val out = ChunkCodec.decodeTyped(Array[Byte](0, 1, 2, 0),
      ZarrDType('b', 1, littleEndian = true), 4)
    assert(out.asInstanceOf[Array[Boolean]].toSeq == Seq(false, true, true, false))
  }

  test("shuffle/unshuffle round-trip on odd sizes") {
    val data = Array.tabulate[Byte](37)(i => (i * 7).toByte)
    for (ts <- Seq(2, 4, 8)) {
      val rt = ChunkCodec.unshuffle(ChunkCodec.shuffle(data, ts), ts)
      assert(rt.sameElements(data), s"typesize $ts")
    }
  }
}
