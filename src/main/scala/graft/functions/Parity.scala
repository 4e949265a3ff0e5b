package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.types.DecimalType

/** Oracle-parity numeric helpers (SURVEY.md §5): the single definition
  * of the exact-decimal money/quantity cast, so the precision recipe
  * cannot drift between operator modules (it is load-bearing for
  * hash-exact DuckDB comparison).
  */
object Parity {
  /** Money/quantity values sum as DECIMAL(18,2) — exact and
    * associative — and only the final result casts back to double.
    */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
}
