package graft

import org.apache.spark.sql.functions._

/** Scratch profiler: band-bucket statistics and output size for the
  * banded-Hamming pairer over the SimHash front-end — is the 10×
  * blow-up candidate-side (fixable) or output-side (inherent)?
  * (dev tool; SCALING.md records the verdict)
  */
object ProfilePhashPairs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1rep")
    val spark = GraftSession.local(32)
    val docs = graft.sources.Tables(spark, sfDir).documents
    val sigs = graft.operators.Dedup.simhashSignatures(docs)
      .select(col("doc_id"), col("sim").as("phash"))
    val bands = sigs.select(col("doc_id"), col("phash"),
      explode(expr("sequence(0, 3)")).as("b"))
      .withColumn("bits", expr("(phash >> (b * 16)) & 65535"))
    val stats = bands.groupBy(col("b"), col("bits")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("buckets"), max(col("n")).as("max_bucket"),
        sum(col("n") * (col("n") - 1) / 2).as("cand_pairs"))
    stats.show(false)
    println("distinct sigs: " + sigs.select(col("phash")).distinct().count()
      + " / docs: " + sigs.count())
    val out = graft.operators.Multimodal.phashPairs(sigs)
    println("output pairs: " + out.count())
    println("output dist=0 pairs: " + out.filter(col("dist") === 0).count())
    spark.stop()
  }
}
