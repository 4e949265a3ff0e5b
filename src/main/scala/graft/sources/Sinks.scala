package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sources and sinks beyond the parquet tables: the reference archives
  * trimmed records to files (`handlers/master.py:58`) and every bus
  * message travels as JSON — these are the batch analogs.
  */
object Sinks {

  /** Archive records as gzipped JSON-lines, partitioned by stream
    * (user_id) — the distributed analog of the reference's per-stream
    * archive file: each partition directory is one stream's archive,
    * writable concurrently by every executor. Append mode: an archive
    * is append-only (the reference appends to its archive file);
    * overwrite would destroy earlier trim cycles' records.
    */
  def archiveJsonl(df: DataFrame, path: String): Unit =
    df.write
      .mode("append")
      .partitionBy("user_id")
      .option("compression", "gzip")
      .json(path)

  /** Write events as date-partitioned parquet: queries filtered on
    * `event_date` prune whole directories at the scan (the
    * time-partitioned layout any 100 TB event store uses).
    */
  def writeEventsPartitioned(events: DataFrame, path: String): Unit =
    events
      .withColumn("event_date", to_date(col("ts")))
      .write
      .mode("overwrite")
      .partitionBy("event_date")
      .parquet(path)

  /** The events JSON-lines schema (the wire format of the bus). */
  val eventJsonSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts_us", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Read a JSON-lines event archive back with the explicit schema —
    * no sampling-based inference pass, so a 100 TB archive restores
    * with a single scan.
    */
  def eventsFromJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(eventJsonSchema).json(path)
      .withColumn("ts", timestamp_micros(col("ts_us")))
}
