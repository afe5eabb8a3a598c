package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Per-bit set-count aggregate over a `bigint` column: one buffer of
  * `nBits` counters, element `k` (1-based in the result array) =
  * `SUM((h >> k-1) & 1)`. The SimHash sketch needs the ±1 bit sums
  * `s_k = SUM(CASE WHEN bit THEN 1 ELSE -1 END)` for 30 bits — with
  * `cnt_k` set-counts and `n = COUNT(*)`, `s_k = 2·cnt_k − n`, so
  * `s_k > 0 ⟺ 2·cnt_k > n` (exact integer arithmetic). One aggregate
  * expression with a tight 30-iteration update loop replaces 30
  * independent `sum(CASE …)` aggregates, each re-evaluating its own
  * shift/mask/branch per gram row into 30 separate buffer slots.
  *
  * Null inputs are skipped (SUM semantics); an all-null/empty group
  * yields all-zero counts — the caller pairs this with COUNT(*) over
  * the same non-null column, matching the oracle's SUM(CASE) exactly.
  */
case class BitSetCounts(child: Expression, nBits: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(nBits >= 1 && nBits <= 64, s"nBits must be in [1, 64], got $nBits")

  override def prettyName: String = "bit_set_counts"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bit_set_counts requires bigint, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nBits)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var k = 0
      while (k < nBits) { buf(k) += (h >>> k) & 1L; k += 1 }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var k = 0
    while (k < nBits) { buf(k) += other(k); k += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    UnsafeArrayData.fromPrimitiveArray(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(nBits * 8).order(ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](nBits)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BitSetCounts =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitSetCounts =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitSetCounts =
    copy(child = newChild)
}

object BitSetCounts {
  def apply(c: Column, nBits: Int): Column =
    ColumnBridge.column(
      BitSetCounts(ColumnBridge.expression(c), nBits).toAggregateExpression())
}
