package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal record: opaque binary payload + typed metadata. */
final case class MMRecord(
    doc_id: Long, content: Array[Byte], format: String,
    width: Int, height: Int, n_frames: Int)

/** A decoded feature row produced by the (stubbed) decoder. */
final case class MMFeatures(
    doc_id: Long, format: String, n_bytes: Int, features: Array[Double])

/** Multimodal-column plumbing (SURVEY.md §2.3): image/audio/video as
  * opaque `binary` columns with typed metadata, decoded per partition
  * in batches.
  *
  * The Spark-side plumbing — schema, partitioning, batch shape — is
  * real; the codec itself is a clearly-marked deterministic STUB
  * (image/audio libraries are not in this container). On a real
  * cluster the stub body is the only thing that changes: swap
  * `fakeDecode` for a JNI/FFI codec call and the operator is
  * unchanged — batching amortizes per-batch codec setup exactly like
  * an Arrow-batched pandas UDF would.
  */
object Multimodal {

  /** Attach a binary payload + typed metadata to each document.
    * Payload bytes are the UTF-8 prefix of the text (deterministic
    * stand-in for a real blob); metadata derives from doc_id with
    * exact integer arithmetic so an SQL oracle can mirror it.
    */
  def attachBinary(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      encode(substring(col("text"), 1, 16), "UTF-8").as("content"),
      element_at(typedlit(Seq("jpeg", "png", "mp4", "wav")),
        (col("doc_id") % 4 + 1).cast("int")).as("format"),
      (col("doc_id") % 640 + 64).cast("int").as("width"),
      (col("doc_id") % 480 + 48).cast("int").as("height"),
      (col("doc_id") % 120 + 1).cast("int").as("n_frames"))

  /** Typed view for the partition-wise decode path. */
  def records(documents: DataFrame)(implicit spark: SparkSession): Dataset[MMRecord] = {
    import spark.implicits._
    attachBinary(documents).as[MMRecord]
  }

  /** STUB deterministic "decode": an 8-bin byte histogram, L1
    * normalized — stands in for pixel/audio feature extraction.
    * Deterministic per input, so specs can assert exact values.
    */
  private[operators] def fakeDecode(r: MMRecord): MMFeatures = {
    val bins = new Array[Double](8)
    r.content.foreach(b => bins((b & 0xff) / 32) += 1.0)
    val total = math.max(1.0, r.content.length.toDouble)
    MMFeatures(r.doc_id, r.format, r.content.length, bins.map(_ / total))
  }

  /** Batched per-partition decode: the real plumbing around the stub.
    * `grouped(batchSize)` is the batch shape a vectorized (Arrow)
    * decoder consumes; no shuffle — runs at scan parallelism.
    */
  def decodeFeatures(records: Dataset[MMRecord], batchSize: Int = 64)
      (implicit spark: SparkSession): Dataset[MMFeatures] = {
    import spark.implicits._
    records.mapPartitions { iter =>
      iter.grouped(batchSize).flatMap { batch =>
        // real codecs initialize per batch here (decoder handle, GPU
        // context, ...); the stub just maps
        batch.iterator.map(fakeDecode)
      }
    }
  }

  /** Frame sampling for video rows: every `step`-th frame index,
    * exploded — a narrow generator, the fan-out stays on executors.
    */
  def frameSample(records: Dataset[MMRecord], step: Int = 30)
      (implicit spark: SparkSession): DataFrame =
    records.toDF()
      .filter(col("format") === "mp4")
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(step))).as("frame_idx"))

  /** Metadata-only "resize": aspect-preserving fit into a maxDim box
    * with exact integer arithmetic (floor of dim·maxDim / longest
    * side; images already inside the box pass through). The typed-
    * metadata transform pattern — the real pixel work would live in
    * the decode stub.
    */
  def resizeMeta(records: Dataset[MMRecord], maxDim: Int = 256)
      (implicit spark: SparkSession): DataFrame =
    records.toDF().select(
      col("doc_id"), col("format"), col("width"), col("height"),
      when(greatest(col("width"), col("height")) <= maxDim, col("width"))
        .otherwise(expr(s"width * $maxDim div greatest(width, height)")
          .cast("int")).as("out_width"),
      when(greatest(col("width"), col("height")) <= maxDim, col("height"))
        .otherwise(expr(s"height * $maxDim div greatest(width, height)")
          .cast("int")).as("out_height"))

  /** The rows-only `mm_meta` query: binary length + typed metadata,
    * all mirrorable by exact integer SQL.
    */
  def meta(documents: DataFrame): DataFrame =
    attachBinary(documents)
      .select(col("doc_id"), length(col("content")).cast("long").as("n_bytes"),
        col("format"), col("width"), col("height"), col("n_frames"))
      .orderBy(col("doc_id"))
}
