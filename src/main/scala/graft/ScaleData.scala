package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev tool: replicate an sf-dir `factor`× with shifted keys so the
  * bench suite can be measured at ~10× scale (sf0.1 → ~sf1) without
  * driver-generated data at that SF.
  *
  * Replica i shifts every join/identity key by i·stride (strides far
  * above each table's key range), so referential integrity holds
  * within a replica and nothing collides across replicas. Dimension
  * tables that do NOT scale with SF (nation, region) are copied once
  * — exactly TPC-H's scaling rule. Two columns get content
  * perturbation so data-dependent operators scale like a genuinely
  * larger corpus instead of a pile of exact copies:
  *  - documents.text: every word is suffixed `rI`, giving each
  *    replica its own shingle vocabulary (near-dup pair graphs grow
  *    linearly, not quadratically across replicas);
  *  - embeddings.embedding: a per-replica sinusoidal offset pushes
  *    cross-replica cosine far below near-dup thresholds while
  *    keeping within-replica geometry identical.
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val srcDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "/tmp/sf1rep"
    val factor = if (args.length > 2) args(2).toInt else 10
    // "skew" mode: same 10× replica, PLUS three planted hot keys — the
    // condition the uniform replica can't test (AQE skew splits, the
    // as-of/window "hot key ⇒ bigger external sort, never memory"
    // claim, and targeted join salting):
    //  - one user owns ~10% of ALL events (hash-deterministic remap);
    //  - one orderkey owns ~10% of lineitem rows (remapped to a real
    //    key, so the join actually matches);
    //  - ~10% of documents share one appended hot shingle run (a
    //    corpus-wide boilerplate token — hot document frequency
    //    without manufacturing a quadratic near-dup cluster).
    val skew = args.length > 3 && args(3) == "skew"
    val spark = GraftSession.local(32)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def src(name: String): DataFrame = spark.read.parquet(s"$srcDir/$name.parquet")
    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[scale] wrote $name")
    }
    /** Union `factor` copies of `base`, transformed per replica. */
    def replicate(base: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => f(base, i)).reduce(_ union _)

    val ORD = 10000000L; val CUST = 1000000L; val PART = 1000000L
    val SUPP = 100000L; val EVT = 10000000L; val USR = 100000L
    val DOC = 1000000L; val VEC = 1000000L

    write(src("region"), "region")
    write(src("nation"), "nation")
    write(replicate(src("customer")) { (d, i) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(i * CUST))
    }, "customer")
    write(replicate(src("supplier")) { (d, i) =>
      d.withColumn("s_suppkey", col("s_suppkey") + lit(i * SUPP))
    }, "supplier")
    write(replicate(src("part")) { (d, i) =>
      d.withColumn("p_partkey", col("p_partkey") + lit(i * PART))
    }, "part")
    write(replicate(src("orders")) { (d, i) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(i * ORD))
        .withColumn("o_custkey", col("o_custkey") + lit(i * CUST))
    }, "orders")
    // a REAL orderkey to concentrate lineitem skew on (must join)
    val hotOrderKey: Long =
      if (skew) src("orders").agg(min(col("o_orderkey"))).head().getLong(0) else 0L
    val lineBase = replicate(src("lineitem")) { (d, i) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(i * ORD))
        .withColumn("l_partkey", col("l_partkey") + lit(i * PART))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * SUPP))
    }
    write(if (!skew) lineBase else lineBase
      // ~10% of the fact table collapses onto one real orderkey; the
      // (partkey, suppkey) tail keeps per-row salt entropy alive
      .withColumn("l_orderkey",
        when(pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(10)) === 0,
          lit(hotOrderKey)).otherwise(col("l_orderkey"))),
      "lineitem")
    val evBase = replicate(src("events")) { (d, i) =>
      d.withColumn("event_id", col("event_id") + lit(i * EVT))
        .withColumn("user_id", col("user_id") + lit(i * USR))
    }
    write(if (!skew) evBase else evBase
      // one flood producer: ~10% of ALL events land on user 1 — the
      // user-keyed window family gets one partition with 10% of the data
      .withColumn("user_id",
        when(pmod(hash(col("event_id")), lit(10)) === 0, lit(1L))
          .otherwise(col("user_id"))),
      "events")
    val docBase = replicate(src("documents")) { (d, i) =>
      d.withColumn("text", regexp_replace(col("text"), "(\\S+)", s"$$1r$i"))
        .withColumn("doc_id", col("doc_id") + lit(i * DOC))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    write(if (!skew) docBase else docBase
      // corpus-wide boilerplate: one shingle shared by ~10% of docs —
      // hot document frequency (stresses df joins + prefix ranking)
      // without planting a quadratic near-dup cluster
      .withColumn("text",
        when(pmod(col("doc_id"), lit(10)) === 0,
          concat(col("text"), lit(" zqhot zqhot zqhot"))).otherwise(col("text")))
      .withColumn("n_chars", length(col("text")).cast("long")),
      "documents")
    write(replicate(src("embeddings")) { (d, i) =>
      d.withColumn("vec_id", col("vec_id") + lit(i * VEC))
        .withColumn("embedding",
          expr(s"transform(embedding, (x, j) -> cast(x + 0.05 * sin((j + 1) * $i) as float))"))
    }, "embeddings")

    println(s"[scale] done: $outDir at ${factor}x $srcDir")
    spark.stop()
  }
}
