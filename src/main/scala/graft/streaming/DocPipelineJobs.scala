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

  /** Live Bloom-filter membership per shard: the streaming twin of
    * `Dedup.bloomShingleFilter`'s verdict side. State per `source`
    * shard is ONE fixed mBits-bit array (O(m), never grows with the
    * stream — the point of a Bloom filter vs `dropDuplicates`'
    * per-key state store), updated as each doc's k fingerprint-derived
    * bit positions are tested then set. Emits
    * (source, doc_id, maybe_seen) — maybe_seen = every bit was
    * already set, i.e. the filter claims an earlier doc of this shard
    * had the same content hash (false positives at the usual Bloom
    * rate, never false negatives). Positions use the SAME permutation
    * family and 31-bit base hash as the batch operator.
    */
  def bloomStream(stream: DataFrame, mBits: Int = 131072, k: Int = 4): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(Integer.bitCount(mBits) == 1, "mBits must be a power of two")
    val perms = graft.expressions.MinhashSignature.permA
      .zip(graft.expressions.MinhashSignature.permB).take(k)
    val prime = graft.expressions.MinhashSignature.Prime
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(col("source").cast("string").as("source"),
        col("doc_id").cast("long").as("doc_id"),
        col("text").cast("string").as("text"))
      .as[(String, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (source: String, rows: Iterator[(String, Long, String)],
            state: GroupState[Array[Long]]) => {
          val bits = state.getOption.getOrElse(new Array[Long](mBits / 64))
          val out = rows.map { case (_, docId, text) =>
            val h = graft.expressions.RollingFingerprint.compute(
              if (text == null) "" else text) >>> 32
            var allSet = true
            perms.foreach { case (a, b) =>
              val pos = (Math.floorMod(a * h + b, prime) % mBits).toInt
              val w = pos >> 6
              val m = 1L << (pos & 63)
              if ((bits(w) & m) == 0L) { allSet = false; bits(w) |= m }
            }
            (source, docId, if (allSet) 1L else 0L)
          }.toVector // drain before the state write below
          state.update(bits)
          out.iterator
        })
      .toDF("source", "doc_id", "maybe_seen")
  }
}
