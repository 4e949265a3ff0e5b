package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables.
  *
  * Plain `spark.read.parquet` so Catalyst keeps full pushdown freedom:
  * filters and projections applied by downstream operators reach the
  * scan (verify via `PushedFilters` / `ReadSchema` in explain output).
  * At cluster scale the same loaders work over a directory of many
  * files; nothing here assumes a single file.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts arrives in one of two physical shapes depending on the
    * generator version: parquet TIMESTAMP(NANOS) — which Spark 4
    * refuses natively, so we read nanos as long and floor-convert to
    * a micros timestamp (DuckDB's flooring ns→us `//` semantics,
    * including pre-epoch values: `div` truncates toward zero, so the
    * mod-subtract form below floors instead) — or plain
    * TIMESTAMP(MICROS) with isAdjustedToUTC=false, which reads as
    * TIMESTAMP_NTZ. Both are normalized to session-local TIMESTAMP so
    * every downstream operator sees one type. The NTZ cast is only
    * wall-clock-preserving under a UTC session, so that invariant is
    * enforced here rather than trusted to every session builder.
    *
    * Session-level side effect, deliberate: `nanosAsLong` must be set
    * when the relation resolves its schema, and the flag is needed by
    * every events read in the session. It is idempotent (constant
    * value ⇒ concurrent setters race benignly), but note that other
    * TIMESTAMP(NANOS) parquet in the same session will then also read
    * as long nanos.
    *
    * Any other physical type for `ts` fails fast right here — a
    * generator change must surface at load, not as an obscure
    * `unix_micros` error three operators downstream.
    */
  def events: DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
      "graft requires a UTC session (GraftSession sets it); events.ts NTZ " +
        "normalization is wall-clock-preserving only under UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t("events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros((ts - pmod(ts, 1000)) div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case TimestampType    => raw
      case other => throw new IllegalArgumentException(
        s"events.ts: expected TIMESTAMP(NANOS-as-long), TIMESTAMP_NTZ or TIMESTAMP, " +
          s"got $other — generator drift, fix the loader deliberately")
    }
  }

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
