package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Similarity search over the embeddings table (SURVEY.md §2.3).
  *
  * Scale design (100 TB): the probe set is small and **broadcast**, the
  * corpus is streamed once — scoring is a broadcast nested-loop that
  * never shuffles the corpus. Top-k then reduces probe-keyed score
  * rows; with a handful of probes that window input is ~|corpus|×|P|
  * rows keyed on probe_id, the same single-shuffle shape as any
  * grouped aggregation. For large probe sets the LSH-bucketed variant
  * (`annLshTopK`) is the scale path: both sides shuffle only on the
  * 16-bit signature key and score strictly within buckets.
  */
object Similarity {

  // zero-norm vectors have no direction: cosine would be NaN, and
  // Spark ranks NaN above every number — they are excluded up front
  // (mirrored in the oracle SQL)
  private def probes(embeddings: DataFrame, nProbes: Int): DataFrame =
    embeddings.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"),
        VectorOps.toDoubleArray(col("embedding")).as("pv"))
      .filter(VectorOps.dot(col("pv"), col("pv")) > 0)

  private def corpus(embeddings: DataFrame, nProbes: Int): DataFrame =
    embeddings.filter(col("vec_id") >= nProbes)
      .select(col("vec_id"), col("label"),
        VectorOps.toDoubleArray(col("embedding")).as("cv"))
      .filter(VectorOps.dot(col("cv"), col("cv")) > 0)

  /** The shared top-k epilogue: rank per probe by cosine desc with a
    * deterministic vec_id tie-break — ONE definition, because the
    * stored-index-equals-inline-operator spec depends on every ANN
    * variant ranking and rounding identically.
    */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("rnk"), col("vec_id"),
        round(col("cos"), 6).as("cos"))
      .orderBy(col("probe_id"), col("rnk"))
  }

  /** Brute-force cosine top-k: exact baseline. Probes broadcast; one
    * pass over the corpus; rank per probe with deterministic
    * tie-break on vec_id.
    */
  def bruteTopK(embeddings: DataFrame, nProbes: Int = 10, k: Int = 5): DataFrame =
    rankTopK(
      corpus(embeddings, nProbes)
        .crossJoin(broadcast(probes(embeddings, nProbes)))
        .withColumn("cos", VectorOps.cosine(col("pv"), col("cv"))), k)

  /** Multi-table LSH ANN: candidates come from nTables independent
    * hyperplane signatures (explode + one equi-join on the packed
    * table key); cosine is computed only for bucket collisions, then
    * duplicate (probe, vec) hits across tables collapse through a
    * keyed aggregate. Tables buy recall, bits buy pruning — with
    * 12 tables × 6 bits a cos≈0.3 true neighbor (this corpus is
    * near-random) is recovered ~45% of the time while scanning ~20%
    * of the corpus; on genuinely clustered embeddings the same
    * parameters prune far harder. Recall vs `bruteTopK` is the spec's
    * property check.
    */
  def annLshTopK(embeddings: DataFrame, nProbes: Int = 10, k: Int = 5,
      nTables: Int = 12, bitsPerTable: Int = 6): DataFrame = {
    val p = probes(embeddings, nProbes)
      .withColumn("bucket",
        explode(VectorOps.lshTableKeys(col("pv"), nTables, bitsPerTable)))
    val c = corpus(embeddings, nProbes)
      .withColumn("bucket",
        explode(VectorOps.lshTableKeys(col("cv"), nTables, bitsPerTable)))
    val scored = c.join(broadcast(p), Seq("bucket"))
      .withColumn("cos", VectorOps.cosine(col("pv"), col("cv")))
      // same pair can collide in several tables; cos is identical on
      // every copy, so a keyed max collapses dups in the one shuffle
      // already needed to rank per probe
      .groupBy(col("probe_id"), col("vec_id"))
      .agg(max(col("cos")).as("cos"))
    rankTopK(scored, k)
  }

  /** One IVF centroid: id + unit-norm vector. */
  final case class Centroid(cluster_id: Int, centroid: Seq[Double])

  /** Corpus → (cluster_id, vec_id, cv) by broadcast centroid argmax —
    * shared by the inline operator and the index builder so stored
    * and inline assignments are identical by construction. Centroids
    * are unit vectors, so argmax_c dot(v, c) ≡ argmax_c cos(v, c):
    * no need to normalize the data side for ranking.
    */
  private def assignClusters(c: DataFrame, cDF: DataFrame): DataFrame =
    c.crossJoin(cDF)
      .withColumn("d", VectorOps.dot(col("cv"), col("centroid")))
      .groupBy(col("vec_id"))
      .agg(expr("max_by(struct(cluster_id, cv), struct(d, -cluster_id))").as("m"))
      .select(col("m.cluster_id").as("cluster_id"), col("vec_id"), col("m.cv").as("cv"))

  /** Each probe's nProbeClusters nearest centroids (broadcast score +
    * per-probe rank) — shared by the inline operator and index search.
    */
  private def probeClusters(p: DataFrame, cDF: DataFrame,
      nProbeClusters: Int): DataFrame = {
    val wp = Window.partitionBy(col("probe_id"))
      .orderBy(col("d").desc, col("cluster_id"))
    p.crossJoin(cDF)
      .withColumn("d", VectorOps.dot(col("pv"), col("centroid")))
      .withColumn("r", row_number().over(wp))
      .filter(col("r") <= nProbeClusters)
      .select(col("probe_id"), col("pv"), col("cluster_id"))
  }

  /** IVF coarse quantizer: deterministic k-means over the unit-
    * normalized corpus (init = lowest-vec_id vectors, Lloyd
    * iterations with exact-decimal component sums so every run
    * assigns identically). The centroid table is the *model* — k·dim
    * doubles, driver-side by design exactly like any learned
    * broadcast dimension — while every data-sized step (assignment,
    * component sums) is a distributed aggregate keyed on vec_id /
    * cluster_id.
    */
  def ivfTrain(corpusVecs: DataFrame, nClusters: Int = 16, iters: Int = 3): Seq[Centroid] = {
    val spark = corpusVecs.sparkSession
    import spark.implicits._
    // norm materialized once per row, THEN divided into each element —
    // a transform(x -> x / sqrt(dot(v,v))) lambda would recompute the
    // full dot product per element
    // persisted: every Lloyd iteration is its own job, and without
    // the cache each one would re-run the scan + per-element
    // normalization lambda (interpreted — HOFs never codegen)
    val unit = corpusVecs
      .withColumn("norm", sqrt(VectorOps.dot(col("cv"), col("cv"))))
      .select(col("vec_id"),
        transform(col("cv"), x => x / col("norm")).as("nv"))
      .persist()
    try {
    var centroids: Seq[Centroid] = unit.orderBy(col("vec_id")).limit(nClusters)
      .collect().zipWithIndex.map { case (r, i) =>
        Centroid(i, r.getSeq[Double](1))
      }.toSeq
    for (_ <- 1 to iters) {
      val cDF = broadcast(spark.createDataset(centroids).toDF())
      // argmax_{c} nv·c per vector, then exact per-component means:
      // sums as DECIMAL(38,18) so addition is associative ⇒ the new
      // centroids are independent of partitioning
      val assigned = unit.crossJoin(cDF)
        .withColumn("d", VectorOps.dot(col("nv"), col("centroid")))
        .groupBy(col("vec_id"))
        .agg(expr("max_by(struct(cluster_id, nv), struct(d, -cluster_id))").as("m"))
        .select(col("m.cluster_id").as("cluster_id"), col("m.nv").as("nv"))
      val comps = assigned
        .select(col("cluster_id"), posexplode(col("nv")).as(Seq("pos", "x")))
        .groupBy(col("cluster_id"), col("pos"))
        .agg(sum(col("x").cast("decimal(38,18)")).cast("double").as("sx"))
        .collect()
      val byCluster = comps.groupBy(_.getInt(0))
      centroids = centroids.map { c =>
        byCluster.get(c.cluster_id) match {
          case Some(rows) =>
            val mean = rows.sortBy(_.getInt(1)).map(_.getDouble(2))
            val norm = math.sqrt(mean.map(x => x * x).sum)
            // empty-direction guard: keep the old centroid if degenerate
            if (norm == 0.0) c else Centroid(c.cluster_id, mean.map(_ / norm).toSeq)
          case None => c // cluster lost all members; keep it in place
        }
      }
    }
    centroids
    } finally unit.unpersist(blocking = false)
  }

  /** IVF ANN: corpus vectors are assigned once to their nearest coarse
    * centroid (broadcast cross-score + keyed argmax — the corpus never
    * shuffles); each probe searches only its nProbeClusters nearest
    * inverted lists. Scanned fraction ≈ nProbeClusters / nClusters on
    * balanced lists; this is the classic IVF-Flat trade. Rows-only
    * oracle; the spec plants an identical vector (guaranteed same
    * cluster as its probe ⇒ guaranteed recall) and reports observed
    * recall vs `bruteTopK`.
    */
  def annIvfTopK(embeddings: DataFrame, nProbes: Int = 10, k: Int = 5,
      nClusters: Int = 16, nProbeClusters: Int = 4, iters: Int = 3): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val c = corpus(embeddings, nProbes)
    val centroids = ivfTrain(c, nClusters, iters)
    val cDF = broadcast(spark.createDataset(centroids).toDF())
    val assigned = assignClusters(c, cDF)
    val pc = probeClusters(probes(embeddings, nProbes), cDF, nProbeClusters)
    rankTopK(
      assigned.join(broadcast(pc), Seq("cluster_id"))
        .withColumn("cos", VectorOps.cosine(col("pv"), col("cv"))), k)
  }

  /** Materialize an IVF index on storage: the tiny centroid table plus
    * the corpus partitioned by cluster_id (one directory per inverted
    * list). Build once, search many — at 100 TB this is the only
    * sane shape: search reads ONLY the probed lists' files via
    * partition pruning, never the full corpus.
    */
  def buildIvfIndex(embeddings: DataFrame, dir: String, nProbes: Int = 10,
      nClusters: Int = 16, iters: Int = 3): Unit = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val c = corpus(embeddings, nProbes)
    val centroids = ivfTrain(c, nClusters, iters)
    val cDF = broadcast(spark.createDataset(centroids).toDF())
    assignClusters(c, cDF)
      .write.mode("overwrite").partitionBy("cluster_id").parquet(s"$dir/lists")
    spark.createDataset(centroids).toDF()
      .write.mode("overwrite").parquet(s"$dir/centroids")
  }

  /** Search a stored IVF index: probes rank the (collected, tiny)
    * centroid table, and the list scan is filtered to the probed
    * cluster_ids — partition pruning keeps the read at
    * ~nProbeClusters/nClusters of the corpus (the spec asserts the
    * pruned scan). Same output contract as [[annIvfTopK]].
    */
  def searchIvfIndex(embeddings: DataFrame, dir: String, nProbes: Int = 10,
      k: Int = 5, nProbeClusters: Int = 4): DataFrame = {
    val spark = embeddings.sparkSession
    val cDF = broadcast(spark.read.parquet(s"$dir/centroids"))
    val pc = probeClusters(probes(embeddings, nProbes), cDF, nProbeClusters)
    val probedIds = pc.select(col("cluster_id")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val lists = spark.read.parquet(s"$dir/lists")
      .filter(col("cluster_id").isin(probedIds: _*)) // partition pruning
    rankTopK(
      lists.join(broadcast(pc), Seq("cluster_id"))
        .withColumn("cos", VectorOps.cosine(col("pv"), col("cv"))), k)
  }

  /** One product-quantization codebook row: subspace, code id, and
    * the (dim/nSub)-dim sub-centroid.
    */
  final case class PqCentroid(s: Int, c: Int, centroid: Seq[Double])

  /** Train PQ codebooks: the unit-normalized vector splits into nSub
    * contiguous subspaces, each L2-quantized to kCodes centroids by
    * the same deterministic Lloyd recipe as [[ivfTrain]] (init =
    * lowest-vec_id subvectors, exact-decimal component sums, argmin
    * ties to the smaller code). The codebook is the model — nSub ×
    * kCodes × subDim doubles, driver-side like any learned broadcast
    * dimension; every data-sized step is a distributed aggregate.
    */
  def pqTrain(corpusVecs: DataFrame, nSub: Int = 8, kCodes: Int = 16,
      iters: Int = 3): Seq[PqCentroid] =
    trainOnSubs(subVectors(corpusVecs, nSub), nSub, kCodes, iters)

  /** Lloyd iterations over an (ideally persisted) subvector table —
    * split out so encode/search callers can share one materialized
    * `subs` across training and encoding instead of recomputing the
    * normalize+explode per iteration job.
    */
  private def trainOnSubs(subs: DataFrame, nSub: Int, kCodes: Int,
      iters: Int): Seq[PqCentroid] = {
    val spark = subs.sparkSession
    import spark.implicits._
    // init = the kCodes lowest vec_ids PRESENT (not 0..k-1 — corpus
    // ids need not start at zero), code id = rank within that set
    val initIds = subs.select(col("vec_id")).distinct()
      .orderBy(col("vec_id")).limit(kCodes)
      .collect().map(_.getLong(0))
    val codeOf = initIds.sorted.zipWithIndex.toMap
    var codebook: Seq[PqCentroid] = subs.filter(col("vec_id").isin(initIds: _*))
      .orderBy(col("s"), col("vec_id")).collect()
      .map(r => PqCentroid(r.getInt(1), codeOf(r.getLong(0)), r.getSeq[Double](2)))
      .toSeq
    for (_ <- 1 to iters) {
      val cb = broadcast(spark.createDataset(codebook).toDF())
      val assigned = assignCodes(subs, cb)
      val comps = assigned
        .select(col("s"), col("c"), posexplode(col("sub")).as(Seq("pos", "x")))
        .groupBy(col("s"), col("c"), col("pos"))
        .agg(sum(col("x").cast("decimal(38,18)")).cast("double").as("sx"),
          count(lit(1)).as("n"))
        .collect()
      val byKey = comps.groupBy(r => (r.getInt(0), r.getInt(1)))
      codebook = codebook.map { pc =>
        byKey.get((pc.s, pc.c)) match {
          case Some(rows) =>
            val mean = rows.sortBy(_.getInt(2))
              .map(r => r.getDouble(3) / r.getLong(4))
            PqCentroid(pc.s, pc.c, mean.toSeq)
          case None => pc // code lost all members; keep it in place
        }
      }
    }
    codebook
  }

  /** (vec_id, s, sub): the unit-normalized vector's nSub contiguous
    * subvectors — one narrow map, the corpus never shuffles.
    */
  private def subVectors(corpusVecs: DataFrame, nSub: Int): DataFrame = {
    val subDim = 64 / nSub
    corpusVecs
      .withColumn("norm", sqrt(VectorOps.dot(col("cv"), col("cv"))))
      .select(col("vec_id"), explode(expr(
        s"transform(sequence(0, ${nSub - 1})," +
          s" s -> struct(s as s, transform(slice(cv, s * $subDim + 1, $subDim)," +
          " x -> x / norm) as sub))")).as("e"))
      .select(col("vec_id"), col("e.s").as("s"), col("e.sub").as("sub"))
  }

  /** Per (vec_id, s): the L2-nearest code (tie → smaller c) against a
    * broadcast codebook — shared by training, encoding and search so
    * assignments agree by construction. argmin‖sub − c‖² ≡
    * argmax (sub·c − ‖c‖²/2), which runs through the codegen'd
    * `graft_dot` instead of an interpreted zip_with fold — this is
    * the hot loop of training AND encoding (|corpus|·nSub·kCodes
    * evaluations per pass).
    */
  private def assignCodes(subs: DataFrame, cb: DataFrame): DataFrame = {
    val scored = cb.withColumn("half_cn2",
      VectorOps.dot(col("centroid"), col("centroid")) / 2.0)
    subs.join(scored, Seq("s"))
      .withColumn("score",
        VectorOps.dot(col("sub"), col("centroid")) - col("half_cn2"))
      .groupBy(col("vec_id"), col("s"))
      .agg(expr("max_by(struct(c, sub), struct(score, -c))").as("m"))
      .select(col("vec_id"), col("s"), col("m.c").as("c"), col("m.sub").as("sub"))
  }

  /** PQ encoding: each corpus vector compresses to one packed long
    * (nSub codes × log₂(kCodes) bits — 64-dim float → 4 bytes at the
    * defaults, a 64× storage cut). This is the 100 TB memory story:
    * the ADC scan in [[annPqTopK]] reads ONLY these codes, never the
    * vectors.
    */
  /** The shared PQ prologue: one persisted subvector table feeds
    * every Lloyd iteration AND the caller's encode/search body — the
    * normalize+explode runs once, not iters+1 times. The (small)
    * body result is checkpointed before the release, so no cached
    * state outlives the call (the Dedup caching contract) — ONE
    * definition, because a fix to the materialize-then-release
    * ordering must not silently miss a second copy.
    */
  private def withTrainedSubs(embeddings: DataFrame, nProbes: Int,
      nSub: Int, kCodes: Int, iters: Int)(
      body: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val subs = subVectors(corpus(embeddings, nProbes), nSub).persist()
    try {
      val codebook = trainOnSubs(subs, nSub, kCodes, iters)
      val cb = broadcast(spark.createDataset(codebook).toDF())
      body(subs, cb).localCheckpoint()
    } finally subs.unpersist(blocking = false)
  }

  def pqCodes(embeddings: DataFrame, nProbes: Int = 10, nSub: Int = 8,
      kCodes: Int = 16, iters: Int = 3): DataFrame = {
    val bitsPerCode = 32 - Integer.numberOfLeadingZeros(kCodes - 1)
    require(nSub * bitsPerCode <= 63, "packed code must fit one long")
    withTrainedSubs(embeddings, nProbes, nSub, kCodes, iters) { (subs, cb) =>
      assignCodes(subs, cb)
        .groupBy(col("vec_id"))
        .agg(sum(expr(
          s"shiftleft(CAST(c AS BIGINT), CAST(s * $bitsPerCode AS INT))"))
          .as("pq_code"))
        .orderBy(col("vec_id"))
    }
  }

  /** PQ ANN: asymmetric-distance top-k. Each probe computes a tiny
    * (nSub × kCodes) dot-product table against the codebook; the
    * corpus contributes only its codes, so the scan is a broadcast
    * lookup join + a (probe, vec)-keyed sum — no vectors move. The
    * approx ranking picks `rerank` candidates, which re-rank by exact
    * cosine (the standard ADC + re-rank shape). Same output contract
    * as [[bruteTopK]]; planted-recall spec.
    */
  def annPqTopK(embeddings: DataFrame, nProbes: Int = 10, k: Int = 5,
      nSub: Int = 8, kCodes: Int = 16, iters: Int = 3, rerank: Int = 20): DataFrame =
    withTrainedSubs(embeddings, nProbes, nSub, kCodes, iters) { (subs, cb) =>
      adcRerankTopK(embeddings,
        assignCodes(subs, cb).select(col("vec_id"), col("s"), col("c")),
        cb, nProbes, nSub, k, rerank)
    }

  /** The shared ADC epilogue: per-probe distance tables against the
    * codebook, the approx (probe, vec) ranking over a codes DataFrame,
    * the `rerank` candidate cut and the exact-cosine re-rank into
    * [[rankTopK]]'s contract. ONE definition, because every
    * code-scanning ANN variant must rank identically — a fix to the
    * dt formula, the ADC tie-break or the rerank cut must not
    * silently miss a variant. `codes` is (vec_id, s, c) for a full
    * ADC scan (every probe × every code); with a `probe_id` column
    * — (probe_id, vec_id, s, c), the IVF-routed shape — each code row
    * scores only against its routed probe.
    */
  private def adcRerankTopK(embeddings: DataFrame, codes: DataFrame,
      cb: DataFrame, nProbes: Int, nSub: Int, k: Int, rerank: Int): DataFrame = {
    val c = corpus(embeddings, nProbes)
    // per-probe distance table: dot(probe_sub, centroid) for every
    // (s, c) — nSub·kCodes rows per probe, broadcast
    val dt = subVectors(
      probes(embeddings, nProbes).select(col("probe_id").as("vec_id"), col("pv").as("cv")),
      nSub)
      .join(cb, Seq("s"))
      .select(col("vec_id").as("probe_id"), col("s"), col("c"),
        VectorOps.dot(col("sub"), col("centroid")).as("dp"))
    val dtKeys =
      if (codes.columns.contains("probe_id")) Seq("probe_id", "s", "c")
      else Seq("s", "c")
    val approx = codes.join(broadcast(dt), dtKeys)
      .groupBy(col("probe_id"), col("vec_id"))
      .agg(sum(col("dp")).as("approx"))
    val wa = Window.partitionBy(col("probe_id"))
      .orderBy(col("approx").desc, col("vec_id"))
    val cand = approx.withColumn("ar", row_number().over(wa))
      .filter(col("ar") <= rerank)
      .select(col("probe_id"), col("vec_id"))
    rankTopK(
      cand.join(c, Seq("vec_id"))
        .join(broadcast(probes(embeddings, nProbes)), Seq("probe_id"))
        .withColumn("cos", VectorOps.cosine(col("pv"), col("cv"))), k)
  }

  /** IVF-PQ ANN: the 100 TB composition — the IVF coarse quantizer
    * routes each probe to nProbeClusters inverted lists, and within
    * the probed lists the ADC scan reads ONLY the PQ codes (4 bytes a
    * vector at the defaults), so a search touches
    * ~(nProbeClusters/nClusters) of the corpus as codes and exactly
    * `rerank` full vectors. Codes here quantize the unit vectors
    * directly (IVF-Flat routing + PQ storage); encoding residuals
    * against the assigned centroid is the standard refinement when
    * quantization error dominates. Rows-only; planted-recall spec.
    */
  def annIvfPqTopK(embeddings: DataFrame, nProbes: Int = 10, k: Int = 5,
      nClusters: Int = 16, nProbeClusters: Int = 4, ivfIters: Int = 3,
      nSub: Int = 8, kCodes: Int = 16, pqIters: Int = 3,
      rerank: Int = 20): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val c = corpus(embeddings, nProbes)
    val centroids = ivfTrain(c, nClusters, ivfIters)
    val cDF = broadcast(spark.createDataset(centroids).toDF())
    val listed = assignClusters(c, cDF) // (cluster_id, vec_id, cv)
    withTrainedSubs(embeddings, nProbes, nSub, kCodes, pqIters) { (subs, cb) =>
      // the stored index shape: (cluster_id, vec_id, s, c) — codes
      // partitioned by inverted list
      val codes = assignCodes(subs, cb)
        .select(col("vec_id"), col("s"), col("c"))
        .join(listed.select(col("cluster_id"), col("vec_id")), Seq("vec_id"))
      val pc = probeClusters(probes(embeddings, nProbes), cDF, nProbeClusters)
      // route codes to probed lists only, then the shared ADC epilogue
      // scores each code row against its routed probe
      val routed = codes.join(broadcast(pc.select(col("probe_id"), col("cluster_id"))),
        Seq("cluster_id"))
        .select(col("probe_id"), col("vec_id"), col("s"), col("c"))
      adcRerankTopK(embeddings, routed, cb, nProbes, nSub, k, rerank)
    }
  }

  /** Range search: every corpus vector within cosine ≥ tau of each
    * probe (the "all near neighbors" companion to top-k — what a
    * contamination / near-dup-against-eval check runs). Probes
    * broadcast, corpus streamed once, no shuffle at all: the filter
    * runs where the scan runs. Same exact-cosine contract as
    * [[bruteTopK]]; swap the corpus side to LSH buckets exactly as
    * `annLshTopK` does when the probe set outgrows a broadcast.
    */
  def rangeSearch(embeddings: DataFrame, nProbes: Int = 10, tau: Double = 0.25): DataFrame =
    corpus(embeddings, nProbes)
      .crossJoin(broadcast(probes(embeddings, nProbes)))
      .withColumn("cos", VectorOps.cosine(col("pv"), col("cv")))
      .filter(col("cos") >= tau)
      .select(col("probe_id"), col("vec_id"), round(col("cos"), 6).as("cos"))
      .orderBy(col("probe_id"), col("vec_id"))

  /** Per-label centroids in long form (label, dim, mean, n): the
    * class-prototype table behind nearest-centroid classification and
    * cluster drift monitoring. One posexplode + one (label, dim)-keyed
    * aggregate — map-side combined, dim×labels keys ⇒ skew-free.
    * Component sums accumulate as DECIMAL(38,15) (exact, associative)
    * so the means are independent of partitioning, then divide out as
    * doubles.
    */
  def labelCentroids(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label"), posexplode(VectorOps.toDoubleArray(col("embedding")))
        .as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,15)")).as("sx"))
      .select(col("label"), col("dim").cast("long").as("dim"),
        round(col("sx").cast("double") / col("n"), 9).as("mean"), col("n"))
      .orderBy(col("label"), col("dim"))

  /** k-NN majority-label classification of the probes: the k nearest
    * corpus vectors vote; ties break toward the smaller label.
    */
  def knnVote(embeddings: DataFrame, nProbes: Int = 10, k: Int = 10): DataFrame = {
    val scored = corpus(embeddings, nProbes)
      .crossJoin(broadcast(probes(embeddings, nProbes)))
      .withColumn("cos", VectorOps.cosine(col("pv"), col("cv")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    val votes = scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .groupBy(col("probe_id"), col("label"))
      .agg(count(lit(1)).as("n_votes"))
    val wv = Window.partitionBy(col("probe_id"))
      .orderBy(col("n_votes").desc, col("label"))
    votes
      .withColumn("r", row_number().over(wv))
      .filter(col("r") === 1)
      .select(col("probe_id"), col("label").as("predicted_label"), col("n_votes"))
      .orderBy(col("probe_id"))
  }
}
