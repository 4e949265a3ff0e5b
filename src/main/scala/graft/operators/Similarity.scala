package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Similarity search over the embeddings table (SURVEY.md §2.3).
  *
  * Scale design (100 TB): the probe set is small and **broadcast**, the
  * corpus is streamed once — scoring is a broadcast nested-loop that
  * never shuffles the corpus. Top-k then reduces probe-keyed score
  * rows; with a handful of probes that window input is ~|corpus|×|P|
  * rows keyed on probe_id, the same single-shuffle shape as any
  * grouped aggregation. For large probe sets the LSH-bucketed variant
  * (`annLshTopK`) is the scale path: both sides shuffle only on the
  * 16-bit signature key and score strictly within buckets.
  */
object Similarity {

  private def probes(embeddings: DataFrame, nProbes: Int): DataFrame =
    embeddings.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"),
        VectorOps.toDoubleArray(col("embedding")).as("pv"))

  private def corpus(embeddings: DataFrame, nProbes: Int): DataFrame =
    embeddings.filter(col("vec_id") >= nProbes)
      .select(col("vec_id"), col("label"),
        VectorOps.toDoubleArray(col("embedding")).as("cv"))

  /** Brute-force cosine top-k: exact baseline. Probes broadcast; one
    * pass over the corpus; rank per probe with deterministic
    * tie-break on vec_id.
    */
  def bruteTopK(embeddings: DataFrame, nProbes: Int = 10, k: Int = 5): DataFrame = {
    val scored = corpus(embeddings, nProbes)
      .crossJoin(broadcast(probes(embeddings, nProbes)))
      .withColumn("cos", VectorOps.cosine(col("pv"), col("cv")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("rnk"), col("vec_id"),
        round(col("cos"), 6).as("cos"))
      .orderBy(col("probe_id"), col("rnk"))
  }

  /** LSH-bucketed ANN: both sides keyed by the 16-bit hyperplane
    * signature; cosine computed only within matching buckets. Recall
    * vs `bruteTopK` is the spec's property check.
    */
  def annLshTopK(embeddings: DataFrame, nProbes: Int = 10, k: Int = 5): DataFrame = {
    val p = probes(embeddings, nProbes)
      .withColumn("bucket", VectorOps.hyperplaneSignature(col("pv"), bits = 8))
    val c = corpus(embeddings, nProbes)
      .withColumn("bucket", VectorOps.hyperplaneSignature(col("cv"), bits = 8))
    val scored = c.join(broadcast(p), Seq("bucket"))
      .withColumn("cos", VectorOps.cosine(col("pv"), col("cv")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("rnk"), col("vec_id"),
        round(col("cos"), 6).as("cos"))
      .orderBy(col("probe_id"), col("rnk"))
  }

  /** k-NN majority-label classification of the probes: the k nearest
    * corpus vectors vote; ties break toward the smaller label.
    */
  def knnVote(embeddings: DataFrame, nProbes: Int = 10, k: Int = 10): DataFrame = {
    val scored = corpus(embeddings, nProbes)
      .crossJoin(broadcast(probes(embeddings, nProbes)))
      .withColumn("cos", VectorOps.cosine(col("pv"), col("cv")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    val votes = scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .groupBy(col("probe_id"), col("label"))
      .agg(count(lit(1)).as("n_votes"))
    val wv = Window.partitionBy(col("probe_id"))
      .orderBy(col("n_votes").desc, col("label"))
    votes
      .withColumn("r", row_number().over(wv))
      .filter(col("r") === 1)
      .select(col("probe_id"), col("label").as("predicted_label"), col("n_votes"))
      .orderBy(col("probe_id"))
  }
}
