package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-13 optimization-pass stage profiler: decompose the bench's
  * heaviest sf0.1 rows (the dedup family, q20, q25, est-eval) into
  * their component stages so the optimization targets the measured
  * dominant term, not the end-to-end guess (dev tool; the verdict
  * tables live in OPTIMIZATION_r13.md).
  *
  * Method: every stage noop-sinks (guide §1.4), interleaved reps with
  * min reported, block store drained between reps (the Bench hygiene),
  * one untimed warm rep for codegen.
  */
object ProfileOpt {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROF_REPS", "3").toInt
    val onlySel = sys.env.get("SPARK_GRAFT_PROF_ONLY").map(_.split(',').toSet)
    val spark = GraftSession.local(cpus)
    import graft.operators.{Caching, Dedup, Relational}
    val t = graft.sources.Tables(spark, sfDir)
    val docs = t.documents

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def release(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    val results = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    def time(label: String)(f: => Unit): Unit =
      if (onlySel.forall(_.exists(label.startsWith))) {
        f; release() // warm
        val ts = (1 to reps).map { _ =>
          val t0 = System.nanoTime(); f; release()
          (System.nanoTime() - t0) / 1e9
        }
        results(label) = ts
        println(f"[prof] $label%-32s min ${ts.min}%6.3f  all ${ts.map(x => f"$x%.3f").mkString(" ")}")
      }

    import org.apache.spark.sql.graftinternal.ColumnBridge.{column, expression}

    // ---- shared front-end ----
    time("text_scan")(noop(docs.select(col("doc_id"), col("text"))))
    time("shingleFps")(noop(Dedup.shingleFps(docs)))
    time("fps_persist_count") {
      val tri = Dedup.shingleFps(docs).persist()
      tri.count(); ()
    }

    // ---- count-join family ----
    time("cj_sizes") {
      noop(Dedup.shingleFps(docs).groupBy(col("doc_id")).agg(count(lit(1)).as("s")))
    }
    time("cj_pairs_agg") {
      val tri = Dedup.shingleFps(docs).persist()
      tri.count()
      noop(tri.select(col("doc_id").as("doc1"), col("h"))
        .join(tri.select(col("doc_id").as("doc2"), col("h")), Seq("h"))
        .filter(col("doc1") < col("doc2"))
        .groupBy(col("doc1"), col("doc2"))
        .agg(count(lit(1)).as("inter")))
    }
    time("dd_ngram_jaccard_full")(noop(Dedup.ngramJaccard(docs)))
    time("dd_containment_full")(noop(Dedup.containmentPairs(docs)))
    time("dd_containment_lsh_full")(noop(Dedup.containmentPairsLsh(docs)))
    time("dd_containment_auto_full")(noop(Dedup.containmentAuto(docs)))
    time("samp_dsir_full")(
      noop(graft.operators.Sampling.dsirScore(t.documents)))

    // ---- LSH / banded family ----
    time("probe_strategy") { Dedup.jaccardStrategy(docs); () }
    def sigsOf(tri: DataFrame): DataFrame =
      tri.select(col("doc_id"), shiftright(col("h"), 32).as("h31"))
        .groupBy(col("doc_id"))
        .agg(column(graft.expressions.MinhashSignature(expression(col("h31")))
          .toAggregateExpression()).as("mh"))
    time("lsh_sigs") {
      val tri = Dedup.shingleFps(docs).persist()
      tri.count()
      noop(sigsOf(tri))
    }
    def bandCands(sigs: DataFrame, rows: Int = 6, bands: Int = 21): DataFrame = {
      val bucketed = sigs.select(col("doc_id"), posexplode(column(
        graft.expressions.BandHashes(expression(col("mh")), rows, bands))))
        .toDF("doc_id", "band_idx", "band_hash")
      bucketed.select(col("doc_id").as("doc1"), col("band_idx"), col("band_hash"))
        .join(bucketed.select(col("doc_id").as("doc2"), col("band_idx"), col("band_hash")),
          Seq("band_idx", "band_hash"))
        .filter(col("doc1") < col("doc2"))
        .select(col("doc1"), col("doc2"))
        .distinct()
    }
    def bandCandsShj(sigs: DataFrame, rows: Int = 6, bands: Int = 21): DataFrame = {
      val bucketed = sigs.select(col("doc_id"), posexplode(column(
        graft.expressions.BandHashes(expression(col("mh")), rows, bands))))
        .toDF("doc_id", "band_idx", "band_hash")
      bucketed.select(col("doc_id").as("doc1"), col("band_idx"), col("band_hash"))
        .hint("shuffle_hash")
        .join(bucketed.select(col("doc_id").as("doc2"), col("band_idx"), col("band_hash")),
          Seq("band_idx", "band_hash"))
        .filter(col("doc1") < col("doc2"))
        .select(col("doc1"), col("doc2"))
        .distinct()
    }
    time("lsh_band_cands") {
      val tri = Dedup.shingleFps(docs).persist()
      tri.count()
      val sigs = sigsOf(tri).persist()
      noop(bandCands(sigs))
    }
    time("lsh_band_cands_shj") {
      val tri = Dedup.shingleFps(docs).persist()
      tri.count()
      val sigs = sigsOf(tri).persist()
      noop(bandCandsShj(sigs))
    }
    time("lsh_verify_inter_shj") {
      val tri = Dedup.shingleFps(docs).persist()
      tri.count()
      val sigs = sigsOf(tri).persist()
      val cands = bandCands(sigs).persist()
      val arr = tri.groupBy(col("doc_id")).agg(sort_array(collect_list(col("h"))).as("hs"))
      noop(cands.hint("shuffle_hash")
        .join(arr.select(col("doc_id").as("doc1"), col("hs").as("hs1")), Seq("doc1"))
        .hint("shuffle_hash")
        .join(arr.select(col("doc_id").as("doc2"), col("hs").as("hs2")), Seq("doc2"))
        .select(col("doc1"), col("doc2"),
          column(graft.expressions.SortedIntersectCount(
            expression(col("hs1")), expression(col("hs2")))).as("inter")))
    }
    time("lsh_verify_inter") {
      val tri = Dedup.shingleFps(docs).persist()
      tri.count()
      val sigs = sigsOf(tri).persist()
      val cands = bandCands(sigs).persist()
      val arr = tri.groupBy(col("doc_id")).agg(sort_array(collect_list(col("h"))).as("hs"))
      noop(cands
        .join(arr.select(col("doc_id").as("doc1"), col("hs").as("hs1")), Seq("doc1"))
        .join(arr.select(col("doc_id").as("doc2"), col("hs").as("hs2")), Seq("doc2"))
        .select(col("doc1"), col("doc2"),
          column(graft.expressions.SortedIntersectCount(
            expression(col("hs1")), expression(col("hs2")))).as("inter")))
    }
    time("dd_jaccard_lsh_full")(noop(Dedup.jaccardLshVerified(docs)))
    time("dd_jaccard_adaptive_full")(noop(Dedup.ngramJaccardAdaptive(docs)))
    // strat signature-stage A/B: the aggregate over the (cached)
    // fingerprint table vs the shuffle-free per-row expression twin
    // (MinhashTextSignature is spec-pinned bit-identical to the agg;
    // s = size(ShingleFingerprints) = count of the exploded distinct
    // fps by construction)
    time("strat_sigs_agg") {
      val tri = Dedup.shingleFps(docs).persist()
      tri.count()
      noop(tri.select(col("doc_id"), shiftright(col("h"), 32).as("h31"))
        .groupBy(col("doc_id"))
        .agg(column(graft.expressions.MinhashSignature(expression(col("h31")))
            .toAggregateExpression()).as("mh"),
          count(lit(1)).as("s"))
        .withColumn("cls", floor(log2(col("s"))).cast("int")))
    }
    time("strat_sigs_perrow") {
      noop(docs.select(col("doc_id"),
          column(graft.expressions.MinhashTextSignature(
            expression(col("text")))).as("mh"),
          size(column(graft.expressions.ShingleFingerprints(
            expression(col("text"))))).cast("long").as("s"))
        .filter(col("mh").isNotNull)
        .withColumn("cls", floor(log2(col("s"))).cast("int")))
    }
    time("dd_strat_full")(noop(Dedup.containmentStratified(docs)))
    time("dd_strat_budget16_full")(
      noop(Dedup.containmentStratified(docs, candBudgetPerDoc = 16L)))

    // ---- stratified generator stage A/B (round 14): the single-scan
    // multi-arm emitter vs the round-13 per-(arm, role) union,
    // candidate generation isolated from sigs fill / probe /
    // verification so the diff prices exactly the plan shape that
    // changed ----
    {
      def sigsPerRow(): DataFrame = docs.select(col("doc_id"),
          column(graft.expressions.MinhashTextSignature(
            expression(col("text")))).as("mh"),
          column(graft.expressions.ShingleFingerprints(
            expression(col("text")))).as("hs"))
        .filter(col("mh").isNotNull)
        .withColumn("s", size(col("hs")).cast("long"))
        .withColumn("cls", floor(log2(col("s"))).cast("int"))
      time("strat_sigs_fill") { sigsPerRow().persist().count(); () }
      def probed(budget: Long) = {
        val sigs = sigsPerRow().persist()
        val probe = Dedup.corpusProbe(sigs, docs.select(
          explode(column(graft.expressions.ShingleFingerprints(
            expression(col("text"))))).as("h")))
        val arms = Dedup.stratifiedArms(0.8, 5, 64, probe.jBg, probe.pairsAtGap,
            budget.toDouble * math.max(probe.nDocs, 1L))
          .collect { case Right(a) => a }
          .filter(a => probe.pairsAtGap(a.g) > 0)
        val occupied = probe.hist.keySet
        (sigs, arms, occupied)
      }
      time("strat_probe") { probed(16L); () }
      def candsOf(small: DataFrame, large: DataFrame): DataFrame =
        small.toDF("doc_a", "ci", "cj", "band_idx", "band_hash")
          .join(large.toDF("doc_b", "ci", "cj", "band_idx", "band_hash"),
            Seq("ci", "cj", "band_idx", "band_hash"))
          .filter(col("doc_a") =!= col("doc_b"))
          .select(least(col("doc_a"), col("doc_b")).as("doc1"),
            greatest(col("doc_a"), col("doc_b")).as("doc2"))
          .distinct()
      def armCands(budget: Long, viaEmit: Boolean): Unit = {
        val (sigs, arms, occupied) = probed(budget)
        def emitUnion(asSmall: Boolean): Seq[DataFrame] = arms.flatMap { arm =>
          val eligible =
            (if (asSmall) occupied.filter(c => occupied.contains(c + arm.g))
             else occupied.filter(c => occupied.contains(c - arm.g))).toSeq
          val base =
            if (asSmall) sigs.filter(col("cls").isin(eligible: _*))
              .select(col("doc_id"), col("cls").as("ci"),
                (col("cls") + arm.g).as("cj"), col("mh"))
            else sigs.filter(col("cls").isin(eligible: _*))
              .select(col("doc_id"), (col("cls") - arm.g).as("ci"),
                col("cls").as("cj"), col("mh"))
          if (eligible.isEmpty || (arm.g == 0 && !asSmall)) None
          else Some(base.select(col("doc_id"), col("ci"), col("cj"),
            posexplode(column(graft.expressions.BandHashes(
              expression(col("mh")), arm.r, arm.b))))
            .toDF("doc_id", "ci", "cj", "band_idx", "band_hash"))
        }
        def emitExpr(asSmall: Boolean): DataFrame = {
          val mask = occupied.filter(c => c >= 0 && c < 64)
            .foldLeft(0L)((m, c) => m | (1L << c))
          sigs.select(col("doc_id"),
              explode(column(graft.expressions.StratBandEmit(
                expression(col("mh")), expression(col("cls")),
                arms.map(a => (a.g, a.r, a.b)), mask, asSmall))).as("e"))
            .select(col("doc_id"), col("e.ci").as("ci"), col("e.cj").as("cj"),
              col("e.band_idx").as("band_idx"), col("e.band_hash").as("band_hash"))
        }
        if (viaEmit) noop(candsOf(emitExpr(true), emitExpr(false)))
        else noop(candsOf(
          emitUnion(true).reduceLeft(_ unionByName _),
          (emitUnion(false) ++ arms.filter(_.g == 0).map { arm =>
            sigs.select(col("doc_id"), col("cls").as("ci"),
              (col("cls") + arm.g).as("cj"),
              posexplode(column(graft.expressions.BandHashes(
                expression(col("mh")), arm.r, arm.b))))
              .toDF("doc_id", "ci", "cj", "band_idx", "band_hash")
          }).reduceLeft(_ unionByName _)))
      }
      time("strat_cands_union_b4")(armCands(4L, viaEmit = false))
      time("strat_cands_emit_b4")(armCands(4L, viaEmit = true))
      time("strat_cands_union_b16")(armCands(16L, viaEmit = false))
      time("strat_cands_emit_b16")(armCands(16L, viaEmit = true))
    }

    // ---- count-join A/B arms (the measured dominant stage of the
    // exact Jaccard/containment family): same (doc1, doc2, inter)
    // result, different physical shape ----
    def cjCurrent(tri: DataFrame): DataFrame =
      tri.select(col("doc_id").as("doc1"), col("h"))
        .join(tri.select(col("doc_id").as("doc2"), col("h")), Seq("h"))
        .filter(col("doc1") < col("doc2"))
        .groupBy(col("doc1"), col("doc2"))
        .agg(count(lit(1)).as("inter"))
    def cjGroupEmit(tri: DataFrame): DataFrame =
      tri.groupBy(col("h"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
        .filter(size(col("ds")) > 1)
        .select(explode(expr(
          "flatten(transform(ds, (x, i) -> transform(slice(ds, i + 2, size(ds) - i - 1)," +
            " y -> struct(x as doc1, y as doc2))))")).as("p"))
        .select(col("p.doc1"), col("p.doc2"))
        .groupBy(col("doc1"), col("doc2"))
        .agg(count(lit(1)).as("inter"))
    def withTri(f: DataFrame => DataFrame): Unit = {
      val tri = Dedup.shingleFps(docs).persist()
      tri.count()
      noop(f(tri))
    }
    time("cjA_current")(withTri(cjCurrent))
    time("cjB_shj_hint")(withTri(tri => cjCurrent(tri.hint("shuffle_hash"))))
    time("cjC_group_emit")(withTri(cjGroupEmit))
    time("cjD_aqe_shj") {
      spark.conf.set("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "128m")
      try withTri(cjCurrent)
      finally spark.conf.set("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "0")
    }

    // ---- pair-graph consumers: pair source precomputed ONCE and
    // parked in a scratch parquet (NOT a cache/checkpoint — the
    // release() between reps would free those blocks and poison the
    // next rep, the first-run crash of this tool) so these stages time
    // only their own work ----
    {
      val pairsDir = java.nio.file.Files.createTempDirectory("graft-prof")
        .resolve("pairs.parquet").toString
      Dedup.ngramJaccardAdaptive(docs).write.mode("overwrite").parquet(pairsDir)
      release()
      val pairs = spark.read.parquet(pairsDir)
      time("cc_given_pairs")(noop(Dedup.connectedComponents(docs, pairs)))
      time("canonicalize_given_pairs")(noop(Dedup.canonicalize(docs, pairs)))
      time("softdedup_given_pairs")(noop(Dedup.softDedupWeights(docs, pairs)))
      time("epilogue_orderby_ckpt") {
        noop(Caching.materialize(pairs.orderBy(col("doc1"), col("doc2"))))
      }
      release()
    }
    time("dd_cluster_cc_full") {
      noop(Dedup.connectedComponents(docs, Dedup.ngramJaccardAdaptive(docs)))
    }

    // ---- est-eval ----
    time("minhash_lsh_full")(noop(Dedup.minhashLsh(docs)))
    time("dd_minhash_est_eval_full")(noop(Dedup.minhashEstEval(docs)))

    // ---- q20 ----
    val li = t.lineitem
    time("q20_smallinput_probe") { Caching.smallInput(li, 1L << 20); () }
    time("q20_hist_exact_branch") {
      val hist = li.groupBy(col("l_returnflag"), col("l_extendedprice"))
        .agg(count(lit(1)).as("c"))
      val wf = org.apache.spark.sql.expressions.Window.partitionBy(col("l_returnflag"))
      val cum = hist
        .withColumn("n", sum(col("c")).over(wf))
        .withColumn("cum", sum(col("c")).over(wf.orderBy(col("l_extendedprice"))))
      noop(cum.groupBy(col("l_returnflag"))
        .agg(min(when(col("cum") * 2 >= col("n"), col("l_extendedprice"))).as("p50"),
          min(when(col("cum") * 20 >= col("n") * 19, col("l_extendedprice"))).as("p95")))
    }
    time("q20_sketch_branch") {
      noop(li.groupBy(col("l_returnflag"))
        .agg(expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("p50_approx"),
          expr("approx_percentile(l_extendedprice, 0.95, 1000)").as("p95_approx")))
    }
    time("q20_full")(noop(Relational.q20ApproxPercentile(li)))
    time("q20_twolevel_forced") {
      val (r, hist) = Relational.q20ApproxPercentilePlan(li)
      noop(Caching.materializeAndRelease(r, hist))
    }

    // ---- q25 ----
    time("q25_join_lo")(noop(t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)))))
    time("q25_full")(noop(Relational.q25SupplierFlow(
      t.lineitem, t.orders, t.customer, t.supplier, t.nation)))

    // ---- fixed per-query overhead: DataFrame construction + analysis
    // + optimization + physical planning, no execution (how much of a
    // ~0.3 s tail row is driver-side planning, not cluster work) ----
    Seq("q1_agg", "ev_funnel", "txt_quality", "samp_stratified",
      "dd_simhash", "ann_lsh_topk").foreach { q =>
      SparkEntry.queries.get(q).foreach { fn =>
        time(s"planonly_$q") {
          fn(spark, sfDir).queryExecution.executedPlan; ()
        }
      }
    }

    println("[prof] ---- summary (min seconds) ----")
    results.foreach { case (l, ts) =>
      println(f"[prof] $l%-32s ${ts.min}%6.3f")
    }
    spark.stop()
  }
}
