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

  /** The documents JSONL schema — the interchange format corpora
    * usually arrive in (one JSON object per line).
    */
  val docJsonSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Ingest a JSONL corpus dump with the explicit schema (no
    * inference scan — at 100 TB the sampling pass alone would be a
    * full read). Malformed lines surface as nulls under the default
    * PERMISSIVE mode; pipelines that must fail loudly pass
    * mode=FAILFAST at the call site.
    */
  def documentsFromJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(docJsonSchema).json(path)

  /** Materialize [[graft.operators.Sampling.shardShuffle]] as a
    * sharded training set on storage: one directory per shard, rows
    * carrying their in-shard position. Rows are clustered by shard
    * and sorted by (shard, pos) before the write, so each shard
    * directory is written by the task that owns it and a sequential
    * reader streams positions in order — the one-writer-per-output-
    * file contract every sharded dataloader feed relies on.
    */
  def writeTrainingShards(documents: DataFrame, path: String,
      nShards: Int = 8): Unit =
    graft.operators.Sampling.shardShuffle(documents, nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").partitionBy("shard").json(path)
}
