package graft

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for representative queries so the
  * scan-pushdown / broadcast / shuffle structure can be audited (the
  * findings are recorded in PLANS.md).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q1_agg", "q2_join_agg", "q3_topk", "q6_filter_agg", "ev_route_dispatch",
      "ev_session_gap", "dd_minhash_lsh", "ann_brute_topk", "txt_tokens")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      println(SparkEntry.queries(n)(spark, "/root/testdata/sf0.01")
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
