package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for embedNearDup's LSH geometry at scale
  * (dev tool; SCALING.md records the verdict).
  */
object ProfileEmbed {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf10gen")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.sources.Tables(spark, sfDir).embeddings
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def release(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    import graft.functions.VectorOps
    for ((t, b) <- Seq((8, 12), (16, 15), (16, 17), (8, 18))) {
      val sig = emb.select(col("vec_id"), VectorOps.toDoubleArray(col("embedding")).as("vd"))
      val bucketed = sig.select(col("vec_id"),
        explode(VectorOps.lshTableKeys(col("vd"), t, b)).as("bucket"))
      val nSig = time(s"($t,$b) signatures+explode count")(bucketed.count())
      val cands = bucketed.select(col("vec_id").as("id1"), col("bucket"))
        .join(bucketed.select(col("vec_id").as("id2"), col("bucket")), Seq("bucket"))
        .filter(col("id1") < col("id2"))
        .select(col("id1"), col("id2"))
        .distinct()
      val nC = time(s"($t,$b) candidates count")(cands.count())
      println(s"[prof] ($t,$b) postings=$nSig candidates=$nC")
      release()
      time(s"($t,$b) full operator")(
        graft.operators.Dedup.embedNearDup(emb, nTables = t, bitsPerTable = b)
          .write.format("noop").mode("overwrite").save())
      release()
    }
    spark.stop()
  }
}
