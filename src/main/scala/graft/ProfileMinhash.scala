package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the minhash LSH pipeline stages (dev tool). */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables(spark, sfDir).documents
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    if (sys.env.contains("SPARK_GRAFT_PROF_COLD")) {
      spark.range(1000000).selectExpr("id % 97 AS k", "id AS v")
        .groupBy("k").sum("v").write.format("noop").mode("overwrite").save()
      time("COLD full minhashLsh")(
        graft.operators.Dedup.minhashLsh(docs).write.format("noop").mode("overwrite").save())
      time("warm full minhashLsh")(
        graft.operators.Dedup.minhashLsh(docs).write.format("noop").mode("overwrite").save())
      spark.stop(); return
    }
    println(s"[prof] docs=${docs.count()}")
    val tri = time("shingles")(
      { val t = graft.operators.Dedup.shingles(docs); t.write.format("noop").mode("overwrite").save(); t })
    println(s"[prof] shingle rows=${tri.count()}")
    val sigs = graft.operators.Dedup.minhashSignatures(docs)
    time("signatures (noop)")(sigs.write.format("noop").mode("overwrite").save())
    val sigsP = sigs.persist()
    time("signatures persist")(sigsP.count())
    val bucketed = sigsP
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, 15), b -> hash(slice(mh, b * 8 + 1, 8)))")))
      .toDF("doc_id", "band_idx", "band_hash")
    val pairs = bucketed.select(col("doc_id").as("doc1"), col("band_idx"), col("band_hash"))
      .join(bucketed.select(col("doc_id").as("doc2"), col("band_idx"), col("band_hash")),
        Seq("band_idx", "band_hash"))
      .filter(col("doc1") < col("doc2"))
      .select(col("doc1"), col("doc2"))
      .distinct()
    println(s"[prof] candidate pairs=${time("pairs count")(pairs.count())}")
    time("full minhashLsh (noop)")(
      graft.operators.Dedup.minhashLsh(docs).write.format("noop").mode("overwrite").save())
    time("full minhashLsh again")(
      graft.operators.Dedup.minhashLsh(docs).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
