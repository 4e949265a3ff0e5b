package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** A registered message shape — the Spark analog of the reference's
  * registered `Message` subclasses (reference `messages/base.py:122`):
  * a message deserializes as the *most specific* type it satisfies.
  *
  * Specificity weight mirrors the reference's ranking (required-field
  * count dominates, an exact `event` literal adds a bonus —
  * `messages/base.py:152-168`): weight = 2·|required| + 3 if an event
  * literal is pinned.
  */
final case class MessageSchema(
    name: String,
    required: Seq[String],
    eventLiteral: Option[String] = None) {
  def weight: Int = required.size * 2 + (if (eventLiteral.isDefined) 3 else 0)
}

/** Weighted-model JSON parsing: one `from_json` against the superset
  * schema, then a single CASE chain (schemas ordered by descending
  * weight) picks the most specific satisfied shape. Fully
  * codegen-friendly — no UDF, one narrow map, scan-speed at 100 TB.
  */
object MessageParser {

  /** Adds `parsed` (superset struct) and `schema_name` (winning shape,
    * or 'unparseable' when the payload isn't JSON at all).
    *
    * Malformed detection: the corrupt-record column fires on both
    * non-JSON and mere type-coercion failures (`{"k": "7"}` against
    * k: LONG); the reference's json-then-rank semantics treat the
    * latter as a *less specific* shape (the bad field nulls out, the
    * ranking falls through), not as unparseable. So only
    * corrupt-flagged rows take a second, lazily-evaluated
    * `try_parse_json` look (null ⇔ truly not JSON) — the hot path
    * parses each payload exactly once.
    */
  def parse(df: DataFrame, jsonCol: Column, schemas: Seq[MessageSchema],
            superset: StructType): DataFrame = {
    val corrupt = "_corrupt_record"
    val withCorrupt = superset.add(corrupt, org.apache.spark.sql.types.StringType)
    val withParsed = df.withColumn("parsed",
      from_json(jsonCol, withCorrupt,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corrupt)))
    val ranked = schemas.sortBy(s => (-s.weight, s.name))
    val chosen = ranked.foldLeft[Column](lit(null).cast("string")) { (acc, s) =>
      val satisfied = s.required
        .map(f => col("parsed").getField(f).isNotNull)
        .foldLeft[Column](lit(true))(_ && _)
      val eventOk = s.eventLiteral
        .map(ev => col("parsed").getField("event") === ev)
        .getOrElse(lit(true))
      // fold builds the CASE chain highest-weight-first: earlier
      // (more specific) matches win, mirroring the reference's ranking
      coalesce(acc, when(satisfied && eventOk, s.name))
    }
    withParsed.withColumn("schema_name",
      when(col("parsed").isNull, "unparseable")
        .when(col("parsed").getField(corrupt).isNotNull &&
          try_parse_json(jsonCol).isNull, "unparseable")
        .otherwise(coalesce(chosen, lit("generic"))))
  }
}
