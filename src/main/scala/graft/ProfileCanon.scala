package graft

/** A/B harness for the canonicalize-family window shape (VERDICT r12
  * #3): `dd_canonicalize` / `dd_soft_dedup` rank over corpus-sized
  * component keys on a frame arriving from a doc_id-keyed join — the
  * same window-after-foreign-key-join silhouette whose tfidf variant
  * round 12 fixed with a forced exchange. The hypothesis difference:
  * here there is NO rank filter over the window, so
  * InferWindowGroupLimit never plants the partial-sort pass that made
  * the tfidf bare shape pathological — both arms should plan one
  * exchange + (for canonicalize) one sort, and the A/B exists to
  * MEASURE that instead of assuming it.
  *
  * Surgical cut: the pair source + connected components dominate the
  * full operators (ProfileCC: CC itself is ~3 s of an 80–245 s sf100
  * operator), so timing full operators would drown a window-stage
  * delta in pair-source noise. Components are computed ONCE and
  * localCheckpoint'ed; the timed region is exactly the label-attach
  * join + window stage each arm ships (`Dedup.canonicalizeOnComps` /
  * `softDedupOnComps`). A `cc_attach` row (labels + CC, untimed
  * context) and full-operator rows print once for scale context.
  *
  * All arms must return identical rows (order-insensitive checksum
  * per run — a wrong fast plan is not a result). Min over `passes`
  * interleaved timed passes after one untimed warm pass per arm.
  *
  * Usage: runMain graft.ProfileCanon [sfDir] [passes]
  */
object ProfileCanon {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/sf10gen"
    val passes = if (args.length > 1) args(1).toInt else 2
    val spark = GraftSession.local(32)
    import org.apache.spark.sql.functions._
    val Dedup = graft.operators.Dedup

    val docs = graft.sources.Tables(spark, sfDir).documents
    println(s"[canon] building pair graph + components once ($sfDir)...")
    val t0 = System.nanoTime()
    val pairs = Dedup.ngramJaccardAdaptive(docs)
    val comps = Dedup.connectedComponents(docs, pairs)
      .select(col("doc_id"), col("component"))
      .localCheckpoint()
    println(f"[canon] pair source + CC + checkpoint: ${(System.nanoTime() - t0) / 1e9}%.1f s " +
      f"(${comps.count()} labeled docs)")

    def frame(arm: String) = arm match {
      case "canon_bare" => Dedup.canonicalizeOnComps(docs, comps, repartitionFirst = false)
      case "canon_repart" => Dedup.canonicalizeOnComps(docs, comps, repartitionFirst = true)
      case "soft_bare" => Dedup.softDedupOnComps(docs, comps, repartitionFirst = false)
      case "soft_repart" => Dedup.softDedupOnComps(docs, comps, repartitionFirst = true)
    }
    def run(arm: String): (Double, Long) = {
      val df = frame(arm)
      val t = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t) / 1e9
      // order-insensitive checksum over every output column; decimal
      // sum — a long sum of 64-bit hashes overflows under ANSI
      val cols = frame(arm).columns.map(c => col(c).cast("string"))
      val chk = frame(arm)
        .select(xxhash64(cols: _*).cast("decimal(38,0)").as("h"))
        .agg(sum(col("h")).as("s")).head().getDecimal(0).longValue()
      (sec, chk)
    }

    val arms = Seq("canon_bare", "canon_repart", "soft_bare", "soft_repart")
    arms.foreach { a => run(a); System.gc() } // warm: JIT + codegen
    val best = scala.collection.mutable.Map[String, Double]()
    val sums = scala.collection.mutable.Map[String, Long]()
    (1 to passes).foreach { p =>
      arms.foreach { a =>
        val (sec, chk) = run(a)
        best(a) = math.min(best.getOrElse(a, Double.MaxValue), sec)
        sums(a) = chk
        println(f"[canon] pass=$p arm=$a%-13s sec=$sec%8.2f checksum=$chk")
        System.gc(); Thread.sleep(500)
      }
    }
    println("[canon] mins: " + arms.map(a => f"$a=${best(a)}%.2f").mkString(" "))
    // canon arms must agree with each other, soft arms with each other
    Seq("canon", "soft").foreach { fam =>
      val famSums = sums.filter(_._1.startsWith(fam)).values.toSet
      if (famSums.size != 1) println(s"[canon] CHECKSUM MISMATCH in $fam: $sums")
      else println(s"[canon] $fam arms identical output (checksum match)")
    }
    spark.stop()
  }
}
