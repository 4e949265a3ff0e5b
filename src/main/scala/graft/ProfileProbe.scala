package graft

import org.apache.spark.sql.SparkSession

/** Scratch checker for the sampled Jaccard/containment strategy probe
  * (round 8): asserts the sampled dispatch decision equals the full
  * aggregate's on every corpus it is handed, and times both probes.
  * Dev tool; SCALING.md records the verdict.
  */
object ProfileProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1", "/tmp/sf1gen2")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $label%-42s $s%8.2f s"); (r, s)
    }
    for (dir <- dirs) {
      val docs = graft.sources.Tables(spark, dir).documents
      val (full, _) = time(s"$dir full")(
        graft.operators.Dedup.jaccardStrategy(docs, probeSampleFraction = 1.0))
      val (sampled, _) = time(s"$dir sampled(0.1)")(
        graft.operators.Dedup.jaccardStrategy(docs))
      println(s"[probe] $dir: full=$full sampled=$sampled " +
        (if (full == sampled) "MATCH" else "*** MISMATCH ***"))
    }
    spark.stop()
  }
}
