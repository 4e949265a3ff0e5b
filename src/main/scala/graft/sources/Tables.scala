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
    * a micros timestamp (DuckDB's ns→us truncation semantics) — or
    * plain TIMESTAMP(MICROS) with isAdjustedToUTC=false, which reads
    * as TIMESTAMP_NTZ. Both are normalized to session-local TIMESTAMP
    * (sessions run UTC, so the wall-clock value is unchanged) so every
    * downstream operator sees one type.
    *
    * Session-level side effect, deliberate: `nanosAsLong` must be set
    * when the relation resolves its schema, and the flag is needed by
    * every events read in the session. It is idempotent (constant
    * value ⇒ concurrent setters race benignly), but note that other
    * TIMESTAMP(NANOS) parquet in the same session will then also read
    * as long nanos.
    */
  def events: DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t("events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _                => raw
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
