package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All `w`-token sliding-window hashes of a space-tokenized document in
  * ONE pass over the raw UTF-8 bytes — element `i` (0-based) equals
  * `xxhash64(array_join(slice(split(text, ' '), i + 1, w), ' '))`
  * exactly, because a window's joined string IS a contiguous byte range
  * of the original text: `split(text, ' ')` (limit −1, empties kept)
  * followed by a single-space join reproduces the bytes between token
  * `i`'s first byte and token `i+w−1`'s last byte verbatim, and 0x20
  * never occurs inside a multi-byte UTF-8 sequence, so byte-scanning
  * for spaces is an exact tokenizer. Hashing that range in place with
  * the same XXH64/seed-42 primitive Spark's `xxhash64` uses makes the
  * result bit-identical with ZERO window-string allocations.
  *
  * Why a custom expression (the d9/d10 hot path): the former
  * `explode(transform(sequence(1, n), i -> array_join(slice(t, i, w),
  * ' ')))` built one UTF8String per position per document — ~w× the
  * corpus in allocations — through an interpreted lambda, only for
  * `xxhash64` to reduce each straight back to 8 bytes. Documents
  * shorter than `w` tokens yield an empty array (explode drops them —
  * the old `size(t) >= w` pre-filter, subsumed).
  */
case class WindowHashes(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, s"window width must be >= 1, got $w")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "window_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"window_hashes requires string, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    WindowHashes.compute(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WindowHashes.compute($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): WindowHashes =
    copy(child = newChild)
}

object WindowHashes {
  private val SEED = 42L // org.apache.spark.sql.catalyst.expressions.XxHash64's default

  /** Static hot path shared by interpreted and generated code. */
  def compute(text: UTF8String, w: Int): ArrayData = {
    val nBytes = text.numBytes
    var spaces = 0
    var i = 0
    while (i < nBytes) { if (text.getByte(i) == 0x20) spaces += 1; i += 1 }
    val nToks = spaces + 1
    val nWins = nToks - w + 1
    if (nWins <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    // token j (0-based) spans bytes [starts(j), starts(j+1) - 1); the
    // sentinel starts(nToks) = nBytes + 1 makes the last token uniform
    val starts = new Array[Int](nToks + 1)
    var t = 1
    i = 0
    while (i < nBytes) {
      if (text.getByte(i) == 0x20) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(nToks) = nBytes + 1
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val out = new Array[Long](nWins)
    var k = 0
    while (k < nWins) {
      val s = starts(k)
      out(k) = XXH64.hashUnsafeBytes(base, off + s, starts(k + w) - 1 - s, SEED)
      k += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def apply(c: Column, w: Int): Column =
    ColumnBridge.column(WindowHashes(ColumnBridge.expression(c), w))
}
