package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Streaming twins of the LLM-training-data document pipeline
  * (SURVEY.md §2.3): the same normalize → quality-cut → hash →
  * fingerprint stages the batch `TextOps.cleanPipeline` runs, applied
  * to a live document feed (`readStream` over an archive drop
  * directory, a queue source, etc.). The stateless stages are shared
  * code with the batch operators — not re-implementations — so batch
  * and streaming results cannot drift apart.
  */
object DocPipelineJobs {

  /** Stateless cleaning + scoring on a document stream: normalize,
    * word/stopword quality cut, content md5 and rolling fingerprint.
    * Hash and fingerprint are computed over the NORMALIZED text (the
    * content identity a cleaning pipeline dedups on) — the standalone
    * batch `TextOps.fingerprint` fingerprints raw text, so compare
    * like with like. Pure narrow maps — no watermark, no state, runs
    * at ingest speed and keeps whatever extra columns the feed
    * carries (e.g. an ingest timestamp for downstream watermarking).
    */
  def cleanStream(stream: DataFrame, minWords: Int = 5,
      maxStopRatio: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.graftinternal.ColumnBridge.{column, expression}
    TextOps.cleanScored(stream, minWords, maxStopRatio)
      .withColumn("fp",
        column(graft.expressions.RollingFingerprint(expression(col("norm_text")))))
      .drop("norm_text", "n_stop")
  }

  /** [[cleanStream]] + live exact dedup on the content hash: the
    * first-seen copy survives (streams have no global min-doc_id; the
    * batch pipeline keeps that canonical form). With `dedupTtl =
    * Some((tsCol, delay))` the dedup state is watermark-bounded —
    * duplicates separated by more than `delay` of event time may both
    * survive, but state cannot grow without bound; with None the
    * state store holds every hash seen (only safe for bounded
    * replays, mirroring the reference's in-memory consumer
    * bookkeeping).
    */
  def dedupCleanStream(stream: DataFrame, minWords: Int = 5,
      maxStopRatio: Double = 0.5,
      dedupTtl: Option[(String, String)] = None): DataFrame = {
    val cleaned = cleanStream(stream, minWords, maxStopRatio)
    dedupTtl match {
      case Some((tsCol, delay)) =>
        cleaned.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark("h")
      case None => cleaned.dropDuplicates("h")
    }
  }
}
