package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** 64-bit SimHash as ONE custom Catalyst aggregate: per word hash a
  * single fused loop adds ±1 into a `long[64]` bit-vote buffer
  * (merged by vector addition across partitions — map-side combine
  * exactly like 64 separate conditional `sum` columns, at one buffer
  * update per row instead of 64 UnsafeRow column writes), then the
  * final eval packs the majority votes into one long.
  *
  * Exactness contract: slot j accumulates
  * `Σ ((h >> j) & 1) * 2 − 1` and the packed bit j is set iff the
  * sum is > 0 — bit-for-bit the declarative
  * `sum(shiftright(h, j) & 1) * 2 − 1` columns + when(s > 0) pack
  * (spec-checked). Null hashes are skipped as `sum` skips nulls; a
  * group with no non-null input packs to 0L exactly like the
  * declarative when-chain (each `when(NULL > 0, ...)` falls to its
  * `otherwise(0L)`), so zero votes naturally produce the zero
  * signature.
  */
case class SimhashSignature(child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a bigint word hash, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_simhash"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < 64) {
        buf(j) += ((h >>> j) & 1L) * 2L - 1L
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var j = 0
    while (j < 64) { b1(j) += b2(j); j += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (buf(j) > 0) sig |= 1L << j
      j += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 8)
    var j = 0
    while (j < 64) { bb.putLong(buf(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val votes = new Array[Long](64)
    var j = 0
    while (j < 64) { votes(j) = bb.getLong(); j += 1 }
    votes
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimhashSignature =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimhashSignature =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimhashSignature =
    copy(child = newChildren.head)
}
