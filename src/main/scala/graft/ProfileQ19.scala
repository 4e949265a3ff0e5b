package graft

import org.apache.spark.sql.functions._

/** Scratch profiler for q19's aggregate branches (round-7 audit):
  * times each sub-aggregate of [[operators.Relational.q19ApproxDistinct]]
  * separately on SPARK_GRAFT_SF_DIR to locate the spill-bound stage
  * on uniformly-spread keys.
  */
object ProfileQ19 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1gen")
    val spark = GraftSession.local(32)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = s.stageInfo.taskMetrics
          val dur = s.stageInfo.completionTime.getOrElse(0L) -
            s.stageInfo.submissionTime.getOrElse(0L)
          if (dur > 500)
            println(f"[stage] ${s.stageInfo.stageId}%4d ${dur / 1e3}%7.2fs " +
              f"gc=${m.jvmGCTime / 1e3}%6.2fs spillMem=${m.memoryBytesSpilled / 1e6}%.0fM " +
              f"spillDisk=${m.diskBytesSpilled / 1e6}%.0fM " +
              f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%.0fM " +
              s"${s.stageInfo.name.takeWhile(_ != '(')}")
        }
      })
    val li = graft.sources.Tables(spark, sfDir).lineitem
    def time(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        println(f"[q19] $name pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    time("countDistinct_parts")(
      li.groupBy(col("l_returnflag")).agg(countDistinct(col("l_partkey"))))
    time("countDistinct_supps")(
      li.groupBy(col("l_returnflag")).agg(countDistinct(col("l_suppkey"))))
    time("approx_both")(
      li.groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey"), 0.02),
          approx_count_distinct(col("l_suppkey"), 0.02)))
    time("plain_count")(li.groupBy(col("l_returnflag")).agg(count(lit(1))))
    time("distinct_pairs")(li.select(col("l_returnflag"), col("l_partkey")).distinct())
    time("full_q19")(graft.operators.Relational.q19ApproxDistinct(li))
    val parts = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"), count(lit(1)).as("n_rows"))
    val supps = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_suppkey")).as("n_supps"))
    val approx = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("pa"),
        approx_count_distinct(col("l_suppkey"), 0.02).as("sa"))
    time("join2")(parts.join(supps, Seq("l_returnflag")))
    time("join3")(parts.join(supps, Seq("l_returnflag")).join(approx, Seq("l_returnflag")))
    time("join3_sorted")(parts.join(supps, Seq("l_returnflag"))
      .join(approx, Seq("l_returnflag")).orderBy(col("l_returnflag")))
    spark.stop()
  }
}
