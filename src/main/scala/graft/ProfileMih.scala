package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Decompose mm_phash_pairs_auto's sf100 cost (VERDICT r11 #2: 25.4×
  * sf10→sf100, a sort-spilling exchange of 66 probe rows/doc). Arms:
  *
  *  - `smj`  — the shipping shape: the (blk, key) bucket join plans
  *    as a sort-merge join, so BOTH sides sort — including the
  *    330 M-row radius-1 probe stream (the suspected spill).
  *  - `shj`  — a SHUFFLE_HASH hint on the index side: the join
  *    builds a hash table from the 2-rows/doc index partition and
  *    STREAMS the probe side — no probe sort anywhere. Semantics
  *    identical (equi-join), pure physical-strategy choice.
  *  - `fine` — the verdict's under-split hypothesis: AQE coalesces
  *    to 64 MB advisory partitions; 16 MB quadruples the reducer
  *    count so each in-task sort fits memory without spilling.
  *  - `shj_fine` — both.
  *
  * Identical-output checksum across arms each run. Corpus stats
  * (docs, distinct hashes, heaviest identical-hash group, output
  * pairs) print first — they decide whether a distinct-hash
  * pre-dedup would even shrink this corpus (it does not: the
  * generated corpus's identical-simhash groups are exact-dup
  * collisions only).
  *
  * Usage: runMain graft.ProfileMih [sfDir] [passes] [arms,csv]
  */
object ProfileMih {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/sf10gen"
    val passes = if (args.length > 1) args(1).toInt else 2
    val arms = (if (args.length > 2) args(2).split(',').toSeq
      else Seq("smj", "shj", "fine", "shj_fine"))
    val spark = GraftSession.local(32)

    val docs = graft.sources.Tables(spark, sfDir).documents
    // front-end ONCE (the auto path materializes it too); profile
    // isolates the pairing back-end the verdict names
    val hashes = graft.operators.Caching.materialize(
      graft.operators.Dedup.simhashSignatures(docs)
        .select(col("doc_id"), col("sim").as("phash")))

    val grp = hashes.groupBy(col("phash")).agg(count(lit(1)).as("m"))
      .agg(count(lit(1)).as("distinct_hashes"), max(col("m")).as("max_group"),
        sum(col("m") * (col("m") - 1) / 2).as("dist0_pairs"))
      .head()
    println(s"[mih] docs=${hashes.count()} distinct=${grp.get(0)} " +
      s"maxGroup=${grp.get(1)} dist0Pairs=${grp.get(2)}")

    def run(arm: String): (Double, Long) = {
      val fine = arm.endsWith("fine") && arm != "fine" || arm == "fine"
      val shj = arm.startsWith("shj")
      if (fine)
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      try {
        def pairs(): DataFrame =
          graft.operators.Multimodal.phashPairsMihArm(hashes, 3, shjHint = shj)
        val t0 = System.nanoTime()
        pairs().write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        val chk = pairs()
          .select(xxhash64(col("doc_a"), col("doc_b"), col("dist"))
            .cast("decimal(38,0)").as("h"))
          .agg(sum(col("h")).as("s")).head().getDecimal(0).longValue()
        (sec, chk)
      } finally if (fine)
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")
    }

    arms.foreach { a => run(a); System.gc() } // warm
    val best = scala.collection.mutable.Map[String, Double]()
    val sums = scala.collection.mutable.Map[String, Long]()
    (1 to passes).foreach { p =>
      arms.foreach { a =>
        val (sec, chk) = run(a)
        best(a) = math.min(best.getOrElse(a, Double.MaxValue), sec)
        sums(a) = chk
        println(f"[mih] pass=$p arm=$a%-9s sec=$sec%8.2f checksum=$chk")
        System.gc(); Thread.sleep(500)
      }
    }
    println("[mih] mins: " + arms.map(a => f"$a=${best(a)}%.2f").mkString(" "))
    if (sums.values.toSet.size != 1) println(s"[mih] CHECKSUM MISMATCH: $sums")
    else println("[mih] all arms identical output (checksum match)")
    spark.stop()
  }
}
