package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 128-permutation MinHash signature as ONE custom Catalyst aggregate:
  * per input row a single fused loop folds the shingle hash through
  * all 128 universal-hash permutations into a `long[128]` min buffer
  * (merged element-wise across partitions — map-side combine exactly
  * like 128 separate `min` columns, at a fraction of the per-row
  * cost: one buffer update instead of 128 UnsafeRow column writes,
  * one expression eval instead of 128 `pmod` subtrees).
  *
  * Exactness contract: buffer slot i holds
  * `min over rows of floorMod(a_i * h + b_i, 2^31 - 1)` — bit-for-bit
  * the declarative `min(pmod(lit(a_i) * h + lit(b_i), p))` columns
  * (spec-checked), so swapping formulations cannot change any
  * downstream LSH result. Null hashes are skipped like `min` skips
  * nulls; a group with no non-null input yields an all-null array
  * exactly as 128 `min` columns would.
  */
case class MinhashSignature(child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  import MinhashSignature._

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a bigint shingle hash, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_minhash"
  override def children: Seq[Expression] = Seq(child)

  // Empty marker: Prime is strictly greater than any floorMod result,
  // so an untouched slot is distinguishable from every real minimum.
  override def createAggregationBuffer(): Array[Long] = Array.fill(NumPerms)(Prime)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < NumPerms) {
        // exact arithmetic: the declarative pmod(a*h+b, p) twin throws
        // under ANSI on long overflow (a full-64-bit hash fed in by
        // mistake) — silently wrapping here would yield wrong
        // signatures with no error, so mirror the ANSI failure
        val x = Math.floorMod(
          Math.addExact(Math.multiplyExact(PermA(i), h), PermB(i)), Prime)
        if (x < buf(i)) buf(i) = x
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < NumPerms) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    // all-null input group: every slot still carries the marker — the
    // declarative twin's min columns would all be NULL
    val out = new Array[Any](NumPerms)
    var i = 0
    while (i < NumPerms) {
      out(i) = if (buf(i) == Prime) null else java.lang.Long.valueOf(buf(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(NumPerms * 8)
    var i = 0
    while (i < NumPerms) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](NumPerms)
    var i = 0
    while (i < NumPerms) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinhashSignature =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinhashSignature =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinhashSignature =
    copy(child = newChildren.head)
}

object MinhashSignature {
  val NumPerms = 128
  val Prime = 2147483647L // 2^31 - 1

  /** The (aᵢ, bᵢ) universal-hash permutation constants, generated once
    * from a fixed seed (java.util.Random's LCG is specified, so every
    * JVM derives the same family). Shared with the declarative twin in
    * [[graft.operators.Dedup]] — ONE definition of the family.
    */
  val (permA, permB): (IndexedSeq[Long], IndexedSeq[Long]) = {
    val rnd = new scala.util.Random(42)
    val pairs = IndexedSeq.fill(NumPerms)(
      (rnd.nextInt(Int.MaxValue - 1).toLong + 1, rnd.nextInt(Int.MaxValue).toLong))
    (pairs.map(_._1), pairs.map(_._2))
  }
  // array views shared with the fused per-row twin (MinhashTextSignature)
  private[expressions] val permAArr: Array[Long] = permA.toArray
  private[expressions] val permBArr: Array[Long] = permB.toArray
  private val PermA: Array[Long] = permAArr
  private val PermB: Array[Long] = permBArr
}
