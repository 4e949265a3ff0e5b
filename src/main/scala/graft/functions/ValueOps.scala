package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column equivalents of the reference's raw-value interpretation
  * utilities (`utilities/common.py`): the bus receives stringly-typed
  * payload fields and coerces them on read. All branches are plain
  * codegen'd expressions — scan-speed coercion of 100 TB of string
  * columns, no UDFs.
  */
object ValueOps {

  private val trueStrings = Seq(
    "1", "t", "T", "True", "TRUE", "true",
    "yes", "Y", "y", "Yes", "YES", "on", "On", "ON")

  /** `is_true` (reference `utilities/common.py:138`) for a string
    * column: null/"" ⇒ false; integer text ⇒ ≠ 0; float text ⇒
    * > minimumTruth (reference default 0.3); otherwise membership in
    * the TRUE_VALUES table (`utilities/constants.py:20`). Numeric text
    * is recognized by the reference's exact INTEGER/FLOATING_POINT
    * patterns (`constants.py:46-49`) — "1e3"/".5"/"+5" intentionally
    * fall through to the membership test, as they do there.
    * try_cast keeps out-of-Long-range digit strings from throwing
    * under ANSI mode (arbitrary-precision ints are truthy ⇒ true).
    */
  def isTrue(c: Column, minimumTruth: Double = 0.3): Column =
    when(c.isNull || c === "", lit(false))
      .when(c.rlike("^-?\\d+$"),
        coalesce(c.try_cast("long") =!= 0, lit(true)))
      .when(c.rlike("^-?\\d+\\.\\d*$"), c.try_cast("double") > minimumTruth)
      // interpret-then-is_true composition: "inf"/"infinity" become
      // math.inf in the reference pipeline, and inf > minimumTruth
      .when(lower(c).isin("inf", "infinity"), lit(true))
      .otherwise(c.isin(trueStrings: _*))

  /** `interpret_value` (reference `utilities/common.py:366`) for a
    * string column: classify into int/float/bool/null/json/string
    * with the reference's exact branch order and numeric patterns
    * (scientific notation / bare ".5" are "string" there too) and
    * surface the typed view. int_value is null (not an error) for
    * digit strings beyond Long range — try_cast, ANSI-safe.
    * Returns struct(vtype, int_value, float_value, bool_value, raw).
    */
  def interpret(c: Column): Column = {
    val lc = lower(c)
    val vtype =
      when(c.isNull, "null")
        .when(c.rlike("^-?\\d+$"), "int")
        .when(c.rlike("^-?\\d+\\.\\d*$"), "float")
        .when(lc.isin("true", "false"), "bool")
        .when(lc.isin("nan", "inf", "infinity", "-inf", "-infinity"), "float")
        .when(c.isin("None", "Null", "null", "nil"), "null")
        .when(try_parse_json(c).isNotNull &&
          (ltrim(c).startsWith("{") || ltrim(c).startsWith("[")) &&
          // the reference falls back to the raw string when the parsed
          // container is empty/falsy (json_to_dict_or_list → `if not data`)
          !regexp_replace(c, "\\s", "").isin("{}", "[]"), "json")
        .otherwise("string")
    struct(
      vtype.as("vtype"),
      when(vtype === "int", c.try_cast("long")).as("int_value"),
      when(vtype === "float",
        when(lc === "nan", lit(Double.NaN))
          .when(lc.isin("inf", "infinity"), lit(Double.PositiveInfinity))
          .when(lc.isin("-inf", "-infinity"), lit(Double.NegativeInfinity))
          .otherwise(c.cast("double"))).as("float_value"),
      when(vtype === "bool", lc === "true").as("bool_value"),
      c.as("raw"))
  }

  /** Reference `get_by_path` (utilities/common.py:298): navigate a
    * JSON payload by string-key / index segments; any missing step
    * yields `default` (NULL when omitted). String segments index
    * objects (bracket-quoted, so keys containing dots or brackets
    * navigate as literal keys), Int/Long segments index arrays; a
    * negative index never matches (reference semantics) so the whole
    * path resolves to the default. Divergence the JSON path model
    * forces: a field that exists with a JSON null value is
    * indistinguishable from a missing field here, so it also yields
    * `default` (the reference returns the found None).
    */
  def getByPath(json: Column, path: Seq[Any], default: Column = lit(null)): Column = {
    val segments = path.map {
      case i: Int => if (i < 0) None else Some(s"[$i]")
      case i: Long => if (i < 0) None else Some(s"[$i]")
      case s =>
        val key = s.toString
        // Spark's JSON-path grammar cannot express quotes, closing
        // brackets, or backslashes inside a bracket-quoted key; fail
        // loudly rather than silently resolving to the default.
        require(!key.exists(ch => ch == '\'' || ch == ']' || ch == '\\'),
          "keys containing quotes, ']' or backslashes are not navigable")
        Some(s"['$key']")
    }
    if (segments.contains(None)) default
    else coalesce(get_json_object(json, "$" + segments.flatten.mkString), default)
  }

  /** Reference `generate_group_name` (utilities/common.py:74):
    * consumer-group naming — stream, application, extras, listener
    * joined by the key separator (reference default ':'). The
    * reference stringifies each extra (`str(None)` == "None"), so a
    * NULL part renders as "None" here too instead of being silently
    * skipped by `concat_ws`. (For a None stream/application/listener
    * the reference's `str.join` would raise; rendering "None" is the
    * closest total-function behavior and keeps the joined shape.)
    */
  def groupName(streamName: Column, applicationName: Column,
      listenerName: Column, extras: Seq[Column] = Seq.empty,
      separator: String = ":"): Column = {
    val parts = (Seq(streamName, applicationName) ++ extras :+ listenerName)
      .map(p => coalesce(p.cast("string"), lit("None")))
    concat_ws(separator, parts: _*)
  }
}
