package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators: generic backward as-of join and
  * key-bounded range (interval) join. The reference's
  * request/response correlation (`messages/base.py:593` — a response
  * points at the latest matching request) is exactly a backward as-of
  * match; these generalize it into reusable library operators.
  *
  * Scale design (100 TB): the as-of join is the union-of-sorted-sides
  * formulation — ONE shuffle on the join key, then a running
  * last-non-null inside each key partition; no per-row probe, no
  * broadcast, no n×m blowup, skew-safe for any one key's volume that
  * fits a partition's sort. The range join keeps the equi-key in the
  * join condition so Spark plans a hash/sort-merge join on the key and
  * evaluates only the range predicate inside each key group.
  */
object Temporal {

  /** Backward as-of join: for every left row, the single most recent
    * right row (same `key`, right ts ≤ left ts). Right rows must be
    * unique per (key, ts) — pre-aggregate ties away, or matches are
    * nondeterministic.
    *
    * Implementation: tag + union both sides, one window per key
    * ordered by (ts, side) — right sorts before left on equal ts so
    * `≤` semantics hold — and carry the last non-null right payload
    * forward. Returns every left column plus `asof` (struct of
    * `carry` columns from the matched right row, null when no match).
    */
  def asofBackward(left: DataFrame, leftTs: String,
      right: DataFrame, rightTs: String,
      key: String, carry: Seq[String]): DataFrame = {
    val rowType = org.apache.spark.sql.types.StructType(left.schema.fields)
    val carryType = org.apache.spark.sql.types.StructType(
      right.select(carry.map(col): _*).schema.fields)
    val lU = left.select(
      col(key).as("__k"), col(leftTs).as("__t"), lit(1).as("__side"),
      struct(left.columns.map(col): _*).as("__row"),
      lit(null).cast(carryType).as("__carry"))
    val rU = right.select(
      col(key).as("__k"), col(rightTs).as("__t"), lit(0).as("__side"),
      lit(null).cast(rowType).as("__row"),
      struct(carry.map(col): _*).as("__carry"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lU.unionByName(rU)
      .withColumn("__m", last(col("__carry"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(Seq(col("__row.*"), col("__m").as("asof")): _*)
  }

  /** Range (interval) join, aggregated: for every left row, aggregate
    * the right rows of the same `key` whose ts falls in
    * [left ts − lookback, left ts). Returns left ids + count and
    * min/max matched right ts. Inner semantics — left rows with no
    * right row in range drop out.
    */
  def rangeJoinAgg(left: DataFrame, leftId: String, leftTs: String,
      right: DataFrame, rightTs: String,
      key: String, lookbackUs: Long): DataFrame = {
    // rename the right side up front: left and right often derive from
    // the same scan (events vs events), and df(col) disambiguation of
    // a self-join is fragile — distinct names make the equi-key
    // unambiguous by construction
    val r = right.select(col(key).as("__rk"), col(rightTs).as("__rt"))
    left.join(r,
        col(key) === col("__rk") &&
          col("__rt") >= col(leftTs) - lookbackUs &&
          col("__rt") < col(leftTs))
      .groupBy(col(leftId), col(key), col(leftTs))
      .agg(count(lit(1)).as("n_matched"),
        min(col("__rt")).as("first_match_us"),
        max(col("__rt")).as("last_match_us"))
  }
}
