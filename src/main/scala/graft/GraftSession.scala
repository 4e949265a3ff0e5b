package graft

import org.apache.spark.sql.SparkSession

/** The one place that knows how a graft session should be configured —
  * what a user of the library calls instead of hand-assembling a
  * builder (and what every graft main uses, so the mains can't drift
  * from the documented recommendation):
  *
  *  - `graft.GraftExtensions` registered (SQL `graft_dot` /
  *    `graft_match_count`, the as-of join strategy and its pushdown
  *    rule);
  *  - UTC session timezone (timestamp arithmetic must not depend on
  *    the submitting host);
  *  - shuffle partitions sized to the parallelism at hand — cores on
  *    a single node; on a cluster pass ~2–3× total executor cores
  *    (AQE coalesces down, it never splits up);
  *  - AQE left ON (default since Spark 3.2) for runtime broadcast
  *    flips and skew splitting.
  *
  * `local(...)` is the single-JVM shape (tests, Verify, Bench);
  * `builder(...)` is the cluster shape — master/deploy settings come
  * from spark-submit, only graft's requirements are added.
  */
object GraftSession {

  /** Builder with graft's requirements applied; master/deploy left to
    * spark-submit. `shufflePartitions <= 0` keeps the cluster or
    * spark-defaults value.
    */
  def builder(shufflePartitions: Int = -1): SparkSession.Builder = {
    val b = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      // the generated-class cache defaults to 100 entries; a session
      // running the full 134-query suite compiles far more codegen
      // units than that, so every pass would silently recompile every
      // plan (Janino time billed to whichever query runs next — the
      // residual drift SCALING.md chased in round 5). Sized for the
      // whole suite to stay resident.
      .config("spark.sql.codegen.cache.maxEntries", "4096")
    if (shufflePartitions > 0)
      b.config("spark.sql.shuffle.partitions", shufflePartitions.toString)
        // AQE coalesces partitions down but NEVER splits them up, so
        // the INITIAL shuffle partition count is the ceiling on
        // post-shuffle parallelism-per-byte — and a count sized to
        // cores alone stops fitting in the execution pool once the
        // data outgrows it (measured at generated sf100: a 600 M-row
        // sort-merge join on 32 partitions = ~19 M rows per in-task
        // sort × 32 concurrent tasks exhausted a 100 GiB heap's
        // execution pool — UnsafeExternalSorter could not acquire its
        // next page with every neighbor holding theirs). Shuffles
        // therefore START wide (32× the configured floor, never below
        // the floor itself if someone configures a floor above 8192)
        // and AQE coalesces down, so at small scale the runtime plan
        // is ~cores-sized and at large scale each reducer sort stays
        // bounded. The floor itself remains
        // `spark.sql.shuffle.partitions` for the few non-AQE
        // surfaces (RDD-level zipWithIndex fallbacks, streaming
        // state stores) where a 32×-wide shuffle would be pure
        // overhead per micro-batch.
        .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
          math.max(shufflePartitions, math.min(shufflePartitions * 32, 8192)).toString)
        // The wide start is only safe because coalescing reaches EVERY
        // shuffle, including those inside persisted subtrees: by
        // default Spark pins a cached plan's output partitioning so
        // the cache stays reusable by partitioning-aware consumers,
        // which disables AQE partition coalescing across the whole
        // cached plan — every shuffle under a .persist() then runs at
        // the full initial width. That was the round-8 regression
        // (dd_containment_lsh/auto, dd_jaccard_lsh 2–4× at sf0.1:
        // their banded/prefix candidate subtrees are persisted, so
        // their shuffles ran 1024-wide on kilobytes; causally isolated
        // by ProfileAqe — initial=1024 alone 4.5/4.7/2.5 s, with this
        // conf 1.2/1.3/1.0 s, matching the initial=32 arm). graft
        // never relies on a cached frame's physical partitioning (all
        // consumers re-shuffle on their own keys), so the trade is
        // pure win: cached subtrees get the same start-wide,
        // coalesce-to-size shape as everything else at sf100, and
        // small inputs coalesce back to ~cores.
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    b
  }

  /** Single-JVM session: `local[cpus]` with shuffle partitions = cpus
    * and the UI off — the shape every graft main and spec runs.
    */
  def local(cpus: Int, quietUi: Boolean = true): SparkSession = {
    val b = builder(cpus)
      .master(s"local[$cpus]")
    val session = (if (quietUi) b.config("spark.ui.enabled", "false") else b)
      .getOrCreate()
    session.sparkContext.setLogLevel("WARN")
    session
  }
}
