package graft

/** Scratch profiler proving WHY the plain join survives the hot key
  * (round-7 skew matrix): times q24PlainJoin on the skew replica with
  * AQE's skew-join split ON vs OFF at high shuffle-partition counts.
  */
object ProfileSkewSplit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1skew")
    val spark = GraftSession.local(32)
    spark.conf.set("spark.sql.shuffle.partitions", "2048")
    val t = graft.sources.Tables(spark, sfDir)
    def run(label: String): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      graft.operators.Relational.q24PlainJoin(t.lineitem, t.orders)
        .write.format("noop").mode("overwrite").save()
      println(f"[skewsplit] $label pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    run("warm")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    run("aqe_skew_split_off")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    run("aqe_skew_split_on")
    spark.stop()
  }
}
