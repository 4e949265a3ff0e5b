package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-breakdown profiler for the LSH-verified Jaccard path
  * (dev tool; SCALING.md records the verdict).
  */
object ProfileLshStages {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1gen")
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
    def release(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    import graft.operators.Dedup
    (1 to 2).foreach { p =>
      time(s"p$p shingleFps noop")(
        Dedup.shingleFps(docs).write.format("noop").mode("overwrite").save())
      release()
      time(s"p$p minhashSignatures noop")(
        Dedup.minhashSignatures(docs).write.format("noop").mode("overwrite").save())
      release()
      time(s"p$p minhashLsh noop")(
        Dedup.minhashLsh(docs).write.format("noop").mode("overwrite").save())
      release()
      time(s"p$p lshVerified noop")(
        Dedup.jaccardLshVerified(docs).write.format("noop").mode("overwrite").save())
      release()
    }
    spark.stop()
  }
}
