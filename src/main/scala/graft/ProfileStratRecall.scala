package graft

import org.apache.spark.sql.functions._

/** Measured-recall harness for the size-stratified containment
  * generator (VERDICT r10 #6): plant known embedded-document pairs at
  * every size-class gap 0..3 INTO a generated corpus, run the full
  * `Dedup.containmentStratified` operator, and report per-gap recall —
  * the committed evidence behind the in-source provisioned-recall
  * claims (Dedup.scala's arm table) and the honest-drop warnings.
  *
  * Planted docs use the generator's own 30-word vocabulary so their
  * shingles blend into the corpus's measured background similarity
  * instead of forming a private easy-to-find vocabulary; the small
  * side is ~40 words (size class 5), the large side embeds the small
  * text verbatim plus same-vocab filler sized to land `g` classes up,
  * so true containment is 1.0 and the pair's fate is decided entirely
  * by the candidate generator's arm geometry. Recall per gap =
  * fraction of planted (small, large) pairs surfaced. A dropped arm
  * (background guard / recall floor) shows up as ~0 recall with the
  * operator's own WARN line alongside — that is the honest-drop
  * contract, measured. SCALING.md records the verdict.
  *
  * Usage: runMain graft.ProfileStratRecall [sfDir] [pairsPerGap] [candBudgetPerDoc]
  * The third argument drives the round-12 recall/cost CURVE: the
  * budget is the caller knob that buys dropped gap arms back at
  * density (VERDICT r11 #4) — measured recall per budget is the
  * evidence a user prices that trade with.
  */
object ProfileStratRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val perGap = if (args.length > 1) args(1).toInt else 100
    val budget = if (args.length > 2) args(2).toLong
      else graft.operators.Dedup.StratifiedCandBudgetPerDoc
    val maxGap = 3
    val spark = GraftSession.local(32)
    import spark.implicits._

    // the GenData vocabulary — planted text must look like corpus
    // text, so reference the generator's own constant (a drifting
    // private copy would make measured recall optimistic)
    val vocab = GenData.DocVocab
    val rnd = new scala.util.Random(20260815L)
    def randDoc(n: Int): String =
      (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")

    // ids far above any generated doc_id; (smallId, largeId) per plant
    val base = 1000000000000L
    val planted = for {
      g <- 0 to maxGap
      k <- 0 until perGap
    } yield {
      val small = randDoc(40) // ~38 distinct shingles → class 5
      // target ~48·2^g distinct shingles → class 5+g (mid-class, so
      // shingle-collision shrinkage at larger sizes can't drop a
      // class); the embed is verbatim → containment exactly 1.0
      val fillerWords = math.max(10, 50 * (1 << g) - 40)
      val large = small + " " + randDoc(fillerWords)
      val sid = base + g * 1000000L + k * 2L
      (g, sid, sid + 1, small, large)
    }
    val plantedDf = planted
      .flatMap { case (_, sid, lid, s, l) => Seq((sid, s), (lid, l)) }
      .toDF("doc_id", "text")

    val docs = graft.sources.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text"))
      .unionByName(plantedDf)

    val t0 = System.nanoTime()
    val found = graft.operators.Dedup
      .containmentStratified(docs, candBudgetPerDoc = budget)
      .filter(col("doc1") >= base && col("doc2") >= base)
      .select(col("doc1"), col("doc2"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val sec = (System.nanoTime() - t0) / 1e9

    println(f"[strat-recall] corpus=$sfDir plantedPerGap=$perGap " +
      f"budget=$budget wall=$sec%.1f s")
    (0 to maxGap).foreach { g =>
      val pairs = planted.filter(_._1 == g)
      val hit = pairs.count { case (_, sid, lid, _, _) =>
        found.contains((sid, lid)) || found.contains((lid, sid))
      }
      println(f"[strat-recall] gap=$g recall=${hit.toDouble / pairs.size}%.3f " +
        f"($hit/${pairs.size})")
    }
    spark.stop()
  }
}
