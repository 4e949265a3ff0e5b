package graft

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex2(id: Long): String =
    MessageDigest.getInstance("MD5").digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).take(1).mkString

  private def docs(rows: (Long, String, String, String)*) = {
    val full = rows.map { case (id, text, lang, src) =>
      (id, text, lang, src, text.length.toLong)
    }
    full.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("stratified sample keeps exactly the rows whose md5 bucket clears the stratum threshold") {
    val d = docs((0L until 200L).map(i =>
      (i, s"text $i", if (i % 3 == 0) "en" else "fr", s"src${i % 4}")): _*)
    val got = Sampling.stratifiedSample(d).collect().map(_.getLong(0)).toSet
    val expected = (0L until 200L).filter { i =>
      val thr = if (i % 3 == 0) "28" else "50"
      md5hex2(i) < thr
    }.toSet
    assert(got == expected)
    assert(got.nonEmpty && got.size < 200) // actually samples, not all/none
    // malformed thresholds skew acceptance silently — reject up front
    for (bad <- Seq("5", "100", "A0"))
      intercept[IllegalArgumentException] {
        Sampling.stratifiedSample(d, thresholds = Map("en" -> bad))
      }
    intercept[IllegalArgumentException] {
      Sampling.stratifiedSample(d, defaultThreshold = "xyz")
    }
  }

  test("holdout split is exhaustive, disjoint, deterministic, and matches the md5 coin") {
    val d = docs((1L to 400L).map(i => (i, s"text $i", "en", "web")): _*)
    val got = Sampling.holdoutSplit(d).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got.size == 400) // every doc gets exactly one split
    // assignment is the pure md5 coin — recompute independently
    got.foreach { case (id, split) =>
      val b = md5hex2(id)
      val expected = if (b < "cc") "train" else if (b < "e6") "val" else "test"
      assert(split == expected, s"doc $id bucket $b")
    }
    // roughly 80/10/10 at this n (loose bounds; the coin is uniform)
    val frac = got.values.groupBy(identity).view.mapValues(_.size / 400.0).toMap
    assert(frac("train") > 0.7 && frac("train") < 0.9)
    assert(frac.getOrElse("val", 0.0) < 0.2 && frac.getOrElse("test", 0.0) < 0.2)
    // growing the corpus never migrates an existing assignment
    val grown = Sampling.holdoutSplit(
      docs((1L to 800L).map(i => (i, s"text $i", "en", "web")): _*)).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    got.foreach { case (id, s) => assert(grown(id) == s) }
  }

  test("corpus report composes clean, dedup, split and rollup consistently") {
    // doc 2 duplicates doc 1 after normalization (case/extra spaces);
    // doc 3 is too short; docs from two sources
    val d = docs(
      (1L, "spark engines shuffle partitions across executors", "en", "web"),
      (2L, "Spark  engines shuffle  partitions across executors", "en", "books"),
      (3L, "hi", "en", "web"),
      (4L, "broadcast small dimension tables for colocated joins", "en", "books"))
    val rep = Sampling.corpusReport(d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // survivors: doc 1 (canonical of {1,2}, source of min id = web), doc 4
    val total = rep.map(_._3).sum
    assert(total == 2, s"got $rep")
    assert(rep.forall(r => Set("train", "val", "test")(r._1)))
    // token totals follow the kept docs' word counts (6 + 7)
    assert(rep.map(_._4).sum == 13)
    // the kept doc's source is the canonical member's source
    assert(rep.collect { case (_, s, n, _) if n > 0 => s }.toSet.subsetOf(Set("web", "books")))
  }

  test("domain mix quota takes at most N per source, deterministically") {
    val d = docs((0L until 120L).map(i => (i, s"t $i", "en", s"src${i % 3}")): _*)
    val out = Sampling.domainMixQuota(d, quota = 10).collect()
    val bySrc = out.groupBy(_.getString(1))
    assert(bySrc.keySet == Set("src0", "src1", "src2"))
    bySrc.values.foreach { g =>
      assert(g.length == 10)
      assert(g.map(_.getLong(2)).toSet == (1L to 10L).toSet)
    }
    // rerun is identical (pure function of the rows)
    val again = Sampling.domainMixQuota(d, quota = 10).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(2))).toSet ==
      again.map(r => (r.getLong(0), r.getLong(2))).toSet)
  }

  test("mixture weights follow n^alpha, normalized and flattened vs raw shares") {
    // src0: 90 docs, src1: 10 docs — alpha=0.7 must pull shares
    // toward each other relative to 0.9/0.1
    val d = docs((0L until 100L).map(i =>
      (i, s"t $i", "en", if (i < 90) "src0" else "src1")): _*)
    val got = Sampling.mixtureWeights(d, alphaPct = 70).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val s0 = math.pow(90, 0.7); val s1 = math.pow(10, 0.7)
    assert(got("src0")._1 == 90 && got("src1")._1 == 10)
    assert(math.abs(got("src0")._2 - s0 / (s0 + s1)) < 1e-6)
    assert(math.abs(got("src0")._2 + got("src1")._2 - 1.0) < 1e-5)
    assert(got("src0")._2 < 0.9 && got("src1")._2 > 0.1) // flattened
  }

  test("length histogram buckets token counts with exact bounds") {
    val d = docs(
      (1L, Seq.fill(10)("w").mkString(" "), "en", "src0"),  // 10 tokens -> bucket 0
      (2L, Seq.fill(49)("w").mkString(" "), "en", "src0"),  // 49 -> bucket 0
      (3L, Seq.fill(50)("w").mkString(" "), "en", "src0"),  // 50 -> bucket 1
      (4L, Seq.fill(120)("w").mkString(" "), "en", "src1")) // 120 -> bucket 2
    val got = Sampling.lengthHistogram(d, bucketWidth = 50).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(("src0", 0L)) == (2L, 10L, 49L))
    assert(got(("src0", 1L)) == (1L, 50L, 50L))
    assert(got(("src1", 2L)) == (1L, 120L, 120L))
  }

  test("packing assigns bins by prefix token sums within each source shard") {
    // 4 docs of 4 tokens each per source, budget 10:
    // cum_prev = 0,4,8,12 -> bins 0,0,0,1
    val d = docs((0L until 8L).map(i =>
      (i, "w w w w", "en", s"src${i % 2}")): _*)
    val out = Sampling.packSequences(d, budget = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    // src0 holds ids 0,2,4,6 in doc_id order; src1 holds 1,3,5,7
    assert(out(0L) == 0 && out(2L) == 0 && out(4L) == 0 && out(6L) == 1)
    assert(out(1L) == 0 && out(3L) == 0 && out(5L) == 0 && out(7L) == 1)
  }

  test("chunking windows cover every token with the declared overlap") {
    val words = (1 to 10).map(i => s"t$i")
    val d = docs((7L, words.mkString(" "), "en", "src0"),
      (8L, "solo", "en", "src0")) // shorter than one chunk -> 1 chunk
    // C=4, overlap=1 -> stride 3; n=10 -> last idx = ceil(6/3) = 2
    val rows = Sampling.chunkSequences(d, chunkTokens = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    val doc7 = rows.filter(_._1 == 7L)
    assert(doc7.map(c => (c._2, c._3, c._4)).toSeq ==
      Seq((0L, 1L, 4L), (1L, 4L, 4L), (2L, 7L, 4L)))
    // consecutive chunks share exactly `overlap` tokens and the last
    // chunk reaches the final token
    assert(doc7.last._3 + doc7.last._4 - 1 == 10L)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String) = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(doc7.head._5 == h("t1 t2 t3 t4"))
    assert(rows.filter(_._1 == 8L).toSeq == Seq((8L, 0L, 1L, 1L, h("solo"))))
    intercept[IllegalArgumentException] {
      Sampling.chunkSequences(d, chunkTokens = 4, overlap = 4)
    }
  }

  test("curriculum stages band each shard by quality rank") {
    // 8 docs, no stopwords -> score grows with word count; ntile(4)
    // over 8 rows = 2 per stage, wordiest docs in stage 1
    val d = docs((1L to 8L).map(i =>
      (i, Seq.fill(i.toInt * 10)("w").mkString(" "), "en", "src0")): _*)
    val got = Sampling.curriculumStages(d).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == Map(8L -> 1L, 7L -> 1L, 6L -> 2L, 5L -> 2L,
      4L -> 3L, 3L -> 3L, 2L -> 4L, 1L -> 4L))
  }

  test("interleaving orders sources proportionally by exact rank ratios") {
    // src0: 4 docs, src1: 2 docs -> src0 appears twice as often
    val d = docs((0L, "x", "en", "src0"), (2L, "x", "en", "src0"),
      (4L, "x", "en", "src0"), (6L, "x", "en", "src0"),
      (1L, "x", "en", "src1"), (3L, "x", "en", "src1"))
    val got = Sampling.interleaveSources(d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // ords: src0 = .25 .5 .75 1.0 over docs 0,2,4,6; src1 = .5 1.0 over 1,3
    // equal ords (.5, 1.0) break by source name then doc_id
    assert(got.toSeq == Seq(
      (0L, "src0", 1L, 4L), (2L, "src0", 2L, 4L), (1L, "src1", 1L, 2L),
      (4L, "src0", 3L, 4L), (6L, "src0", 4L, 4L), (3L, "src1", 2L, 2L)))
  }

  test("token budget keeps the quality prefix per shard, never overruns") {
    import graft.operators.Sampling
    // 12 docs, 2 shards; quality rises with word count (all < 100
    // words); budget 40 → 20 tokens per shard
    val d = (0L until 12L).map(i =>
      (i, (1 to (3 + i.toInt)).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Sampling.tokenBudgetSelect(d, budget = 40, nShards = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)))
    // kept rows per shard sum within budget
    out.groupBy(_._2).foreach { case (_, g) =>
      val kept = g.filter(_._5 == 1L)
      assert(kept.map(_._3).sum <= 20)
      // the kept set is exactly the top-score (here: longest) prefix:
      // every kept doc has more words than any dropped doc in-shard
      val dropped = g.filter(_._5 == 0L)
      if (kept.nonEmpty && dropped.nonEmpty)
        assert(kept.map(_._3).min >= dropped.map(_._3).max)
    }
    assert(out.exists(_._5 == 1L) && out.exists(_._5 == 0L))
  }

  test("shard/DSIR/bucket operators are total on empty input") {
    val empty = docs()
    assert(Sampling.shardShuffle(empty).collect().isEmpty)
    assert(Sampling.dsirScore(empty).collect().isEmpty)
    assert(Sampling.lengthBuckets(empty).collect().isEmpty)
    // a corpus with no target-source docs still scores (target LM is
    // all-smoothing): every doc is anti-target by construction
    val noTarget = docs((0L, "alpha beta", "en", "web"), (1L, "beta gamma", "en", "web"))
    val out = Sampling.dsirScore(noTarget, targetSource = "tgt").collect()
    assert(out.length == 2 && out.forall(!_.getBoolean(4)))
  }

  test("DSIR importance score ranks target-vocabulary docs above general ones") {
    // target domain (tgt) speaks about physics; general corpus about cooking
    val d = docs(
      (0L, "quark lepton boson field quark", "en", "tgt"),
      (1L, "boson field quantum spin lepton", "en", "tgt"),
      (2L, "flour butter sugar oven bake", "en", "webA"),
      (3L, "boson quark field lepton quantum", "en", "webB"), // physics text outside the domain
      (4L, "bake sugar oven whisk flour", "en", "webB"))
    val out = Sampling.dsirScore(d, targetSource = "tgt").collect()
      .map(r => r.getLong(0) -> (r.getDouble(3), r.getBoolean(4))).toMap
    // the physics doc from a general source must score like the domain...
    assert(out(3L)._1 > 0 && out(3L)._2)
    // ...and strictly above every cooking doc
    assert(out(3L)._1 > out(2L)._1 && out(3L)._1 > out(4L)._1)
    // cooking docs are anti-target
    assert(!out(2L)._2 && !out(4L)._2)
    // deterministic across runs
    val again = Sampling.dsirScore(d, targetSource = "tgt").collect()
      .map(r => r.getLong(0) -> (r.getDouble(3), r.getBoolean(4))).toMap
    assert(out == again)
  }

  test("length bucketing forms homogeneous batches and accounts padding waste exactly") {
    val d = docs((0L until 30L).map(i =>
      (i, Seq.fill(3 + (i % 5).toInt)("w").mkString(" "), "en", "web")): _*)
    val out = Sampling.lengthBuckets(d, bucketWidth = 4, batchSize = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.map(_._3).sum == 30L) // every doc lands in exactly one batch
    out.foreach { case (_, _, nDocs, maxTok, waste) =>
      assert(nDocs >= 1 && nDocs <= 4)
      assert(waste >= 0 && waste <= (maxTok - 1) * (nDocs - 1))
    }
    // bucket b holds only lengths in [4b, 4b+4): waste within a batch
    // is bounded by (width-1) per doc
    out.foreach { case (_, _, nDocs, _, waste) => assert(waste <= 3 * nDocs) }
  }

  test("shard shuffle: disjoint exhaustive shards, contiguous positions, layout-independent") {
    val d = docs((0L until 120L).map(i =>
      (i, s"doc $i", "en", s"src${i % 3}")): _*)
    val out = Sampling.shardShuffle(d, nShards = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._3).sorted.toSeq == (0L until 120L).toSeq) // every doc exactly once
    out.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(_._2).sorted.toSeq == (1L to g.length).toSeq) // pos contiguous
    }
    // identical assignment AND order on a different partition layout
    val re = Sampling.shardShuffle(d.repartition(7), nShards = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == re.toSeq)
  }

  test("shard shuffle: a document's shard never changes when the corpus grows") {
    val small = docs((0L until 40L).map(i => (i, s"d$i", "en", "web")): _*)
    val large = docs((0L until 200L).map(i => (i, s"d$i", "en", "web")): _*)
    val sSmall = Sampling.shardShuffle(small).collect()
      .map(r => r.getLong(2) -> r.getLong(0)).toMap
    val sLarge = Sampling.shardShuffle(large).collect()
      .map(r => r.getLong(2) -> r.getLong(0)).toMap
    sSmall.foreach { case (doc, shard) => assert(sLarge(doc) == shard) }
    // the shuffle actually breaks the id order: within some shard the
    // doc ids must not be monotone (otherwise it's not a shuffle)
    val ordered = Sampling.shardShuffle(large).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).values.map(_.sortBy(_._2).map(_._3).toSeq)
    assert(ordered.exists(ids => ids != ids.sorted))
  }
}
