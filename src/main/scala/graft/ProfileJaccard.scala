package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler: count-join exact jaccard vs a df≥2-pruned variant
  * (dev tool; PLANS.md records the verdict).
  */
object ProfileJaccard {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
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
    def pruned(tauNum: Int = 50, tauDenom: Int = 100) = {
      val tri = graft.operators.Dedup.shingles(docs)
      val sizes = tri.groupBy(col("doc_id")).agg(count(lit(1)).as("s"))
      val dup = tri.groupBy(col("g")).agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2).select(col("g"))
      val joinable = tri.join(dup, Seq("g"))
      val pairs = joinable.select(col("doc_id").as("doc1"), col("g"))
        .join(joinable.select(col("doc_id").as("doc2"), col("g")), Seq("g"))
        .filter(col("doc1") < col("doc2"))
        .groupBy(col("doc1"), col("doc2"))
        .agg(count(lit(1)).as("inter"))
      pairs
        .join(sizes.select(col("doc_id").as("doc1"), col("s").as("s1")), Seq("doc1"))
        .join(sizes.select(col("doc_id").as("doc2"), col("s").as("s2")), Seq("doc2"))
        .filter(col("inter") * tauDenom >= (col("s1") + col("s2") - col("inter")) * tauNum)
        .select(col("doc1"), col("doc2"), col("inter"), col("s1"), col("s2"))
        .orderBy(col("doc1"), col("doc2"))
    }
    // warm both plans, then min-of-2 each
    time("warm count-join")(graft.operators.Dedup.ngramJaccard(docs)
      .write.format("noop").mode("overwrite").save())
    time("warm pruned")(pruned().write.format("noop").mode("overwrite").save())
    (1 to 2).foreach { i =>
      time(s"count-join p$i")(graft.operators.Dedup.ngramJaccard(docs)
        .write.format("noop").mode("overwrite").save())
      time(s"pruned p$i")(pruned().write.format("noop").mode("overwrite").save())
    }
    val a = graft.operators.Dedup.ngramJaccard(docs).count()
    val b = pruned().count()
    println(s"[prof] rows count-join=$a pruned=$b equal=${a == b}")
    spark.stop()
  }
}
