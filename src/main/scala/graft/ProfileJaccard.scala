package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler (dev tool; PLANS.md + SCALING.md record verdicts).
  *
  * Round-6 use: count-join exact Jaccard vs a df≥2-pruned variant
  * (verdict: pruning doesn't pay on the dense corpus, recorded in
  * PLANS.md).
  *
  * Round-7 use: exact count-join vs [[graft.operators.Dedup
  * .jaccardLshVerified]] on a corpus dir — timings, the adaptive
  * probe's regime pick, and full RESULT SET equality in both
  * directions (the empirical recall=1.0 evidence behind wiring the
  * pair-graph family to the adaptive dispatcher).
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
    def release(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    println(s"[prof] corpus=$sfDir strategy=${graft.operators.Dedup.jaccardStrategy(docs)}")
    // warm both plans, then min-of-2 each
    time("warm exact count-join")(graft.operators.Dedup.ngramJaccard(docs)
      .write.format("noop").mode("overwrite").save()); release()
    time("warm lsh-verified")(graft.operators.Dedup.jaccardLshVerified(docs)
      .write.format("noop").mode("overwrite").save()); release()
    (1 to 2).foreach { i =>
      time(s"exact count-join p$i")(graft.operators.Dedup.ngramJaccard(docs)
        .write.format("noop").mode("overwrite").save()); release()
      time(s"lsh-verified p$i")(graft.operators.Dedup.jaccardLshVerified(docs)
        .write.format("noop").mode("overwrite").save()); release()
    }
    val exact = graft.operators.Dedup.ngramJaccard(docs)
    val lsh = graft.operators.Dedup.jaccardLshVerified(docs)
    val nExact = exact.count(); val nLsh = lsh.count()
    val missed = exact.exceptAll(lsh).count() // recall gaps
    val spurious = lsh.exceptAll(exact).count() // must be 0 (exact verify)
    println(s"[prof] pairs exact=$nExact lsh=$nLsh missed=$missed spurious=$spurious " +
      s"equal=${missed == 0 && spurious == 0}")
    spark.stop()
  }
}
