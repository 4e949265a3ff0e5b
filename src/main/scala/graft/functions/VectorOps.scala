package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector primitives over `array<float>` embedding columns, built on
  * codegen'd higher-order functions (`zip_with`/`aggregate`) — no UDFs,
  * so they inline into whole-stage codegen.
  *
  * Determinism contract: elements are cast to double *before* any
  * arithmetic and accumulated strictly left-to-right (aggregate is a
  * sequential fold), which bit-matches DuckDB's list_dot_product on
  * DOUBLE[] — that is what makes a SQL oracle possible for cosine
  * results.
  */
object VectorOps {

  def toDoubleArray(v: Column): Column =
    transform(v, x => x.cast("double"))

  /** Dot product via the native codegen'd [[graft.expressions.DotProduct]]
    * expression — same strict left-to-right double accumulation as a
    * fold, minus per-row array allocation and boxing.
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftinternal.ColumnBridge.{column, expression}
    column(graft.expressions.DotProduct(expression(a), expression(b)))
  }

  /** cosine(a,b) = a·b / (√(a·a)·√(b·b)) — formula mirrored
    * operation-for-operation by the oracle SQL.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))


  /** Deterministic pseudo-random hyperplanes, generated once on the
    * driver from a fixed seed (java.util.Random's LCG is specified, so
    * identical everywhere) and inlined as array literals — no per-row
    * plane construction, nothing to broadcast. Table t of the
    * multi-table LSH owns planes [t·bits, (t+1)·bits).
    */
  private val planes: IndexedSeq[Seq[Double]] = {
    val rnd = new scala.util.Random(20240801L)
    // 1024 planes: the sequential draws mean the first 128 are
    // bit-identical to the original 128-plane family (so every
    // oracled small-corpus tier is unchanged) and the first 512 to
    // the round-7 extension; the second extension exists for the
    // recall-held deep tiers of the corpus-scaled geometry (e.g.
    // 35 tables × 25 bits at 10⁸ vectors — plane evaluation is a
    // narrow map, ~65k FLOPs/vector at the full budget, nothing next
    // to the candidate shuffle the extra bits prevent)
    IndexedSeq.fill(1024)(Seq.fill(64)(rnd.nextDouble() * 2.0 - 1.0))
  }

  // one shared matrix instance so repeated lshTableKeys calls build
  // reference-equal (canonicalizable) expression trees
  private val planeMatrix: Array[Array[Double]] = planes.map(_.toArray).toArray

  /** The plane family, for interpolating exact double literals into
    * the DuckDB oracle SQL (Double.toString round-trips, and DuckDB's
    * parser is correctly rounded, so the oracle sees bit-identical
    * planes).
    */
  private[graft] def planeRows: IndexedSeq[Seq[Double]] = planes

  /** Multi-table LSH keys: nTables independent signatures of
    * bitsPerTable hyperplane bits each (table t uses planes
    * [t·bits, (t+1)·bits)), the table index packed into the high bits
    * so one `explode` + equi-join covers all tables at once. A pair
    * within angle θ collides in ≥1 table with probability
    * 1 − (1 − (1 − θ/π)^bits)^nTables — tables buy recall, bits buy
    * precision. Requires nTables·bitsPerTable ≤ 1024. The plane family
    * is 64-dim: vectors of any other length get a NULL key array, so
    * a downstream `explode` drops them from candidate generation
    * instead of silently colliding every vector into one bucket
    * (DotProduct returns null on length mismatch, which would fold
    * each `when` to 0 and collapse all signatures to t<<32).
    */
  def lshTableKeys(vd: Column, nTables: Int, bitsPerTable: Int,
      planeOffset: Int = 0): Column = {
    require(planeOffset >= 0 && planeOffset + nTables * bitsPerTable <= 1024,
      "not enough hyperplanes")
    // the table index lives at bit 32 — wider signatures would alias it
    require(bitsPerTable <= 32, "signature must fit below the table-index bits")
    import org.apache.spark.sql.graftinternal.ColumnBridge.{column, expression}
    // planeOffset selects an independent plane range — e.g. the
    // verification sign-sketch draws from the TOP of the family so
    // its bits never correlate with the bucket keys' planes (which
    // fill from 0); a shared plane would bias the sketch's match
    // count upward on exactly the pairs the buckets selected
    column(graft.expressions.LshSignatures(
      expression(vd), planeMatrix.drop(planeOffset), nTables, bitsPerTable))
  }
}
