package graft

/** A/B/C harness for the grouped-TF-IDF top-k plan (VERDICT r11 #1:
  * txt_tfidf_terms was 22.6× sf10→sf100 — a 150 M-row sort under the
  * doc_id window). Three arms over the SAME scored table:
  *
  *  - `window_bare`  — the pre-round-12 shape: bare window, so
  *    InferWindowGroupLimit plants a partial top-k (local sort +
  *    limit) BEFORE the group exchange;
  *  - `window_repart` — exchange first (repartition on doc_id), one
  *    post-exchange sort feeds both the window and the group-limit;
  *  - `agg` — the bounded TermTopKAggregator (map-side O(k) heap per
  *    group, no sort anywhere), run at the configured
  *    ObjectHashAggregate fallback threshold AND with it raised so
  *    the hash map actually holds corpus-sized group counts.
  *
  * All arms must return identical rows (checked via checksum each
  * run — a wrong fast plan is not a result). Min over `passes`
  * timed passes after one untimed warm pass per arm.
  *
  * Usage: runMain graft.ProfileTfidf [sfDir] [passes] [arms,csv]
  */
object ProfileTfidf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/sf10gen"
    val passes = if (args.length > 1) args(1).toInt else 2
    val arms = (if (args.length > 2) args(2).split(',').toSeq
      else Seq("window_bare", "window_repart", "agg", "agg_raised"))
    val spark = GraftSession.local(32)
    import org.apache.spark.sql.functions._

    val docs = graft.sources.Tables(spark, sfDir).documents
    def run(arm: String): (Double, Long) = {
      val raised = arm == "agg_raised"
      val realArm = if (raised) "agg" else arm
      if (raised)
        spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
          (8 << 20).toString)
      try {
        val df = graft.operators.TextOps.tfidfTopTermsArm(docs, 5, realArm)
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        // identical-output check: order-insensitive checksum over all
        // four columns (cheap next to the ranking itself)
        // decimal sum: a long sum of 64-bit hashes overflows under ANSI
        val chk = graft.operators.TextOps.tfidfTopTermsArm(docs, 5, realArm)
          .select(xxhash64(col("doc_id"), col("rnk"), col("term"),
            col("score").cast("string")).cast("decimal(38,0)").as("h"))
          .agg(sum(col("h")).as("s")).head().getDecimal(0).longValue()
        (sec, chk)
      } finally if (raised)
        spark.conf.unset("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
    }

    // warm pass (JIT + codegen) then timed passes, interleaved so no
    // arm owns the warmer page cache
    arms.foreach { a => run(a); System.gc() }
    val best = scala.collection.mutable.Map[String, Double]()
    val sums = scala.collection.mutable.Map[String, Long]()
    (1 to passes).foreach { p =>
      arms.foreach { a =>
        val (sec, sum) = run(a)
        best(a) = math.min(best.getOrElse(a, Double.MaxValue), sec)
        sums(a) = sum
        println(f"[tfidf] pass=$p arm=$a%-14s sec=$sec%8.2f checksum=$sum")
        System.gc(); Thread.sleep(500)
      }
    }
    println(f"[tfidf] corpus=$sfDir mins: " + arms.map(a =>
      f"$a=${best(a)}%.2f").mkString(" "))
    if (sums.values.toSet.size != 1)
      println(s"[tfidf] CHECKSUM MISMATCH: $sums")
    else println("[tfidf] all arms identical output (checksum match)")
    spark.stop()
  }
}
