package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventOps
import graft.sources.{Sinks, Tables}

/** Archive sink + JSONL source roundtrip (the reference's trim-archive
  * file and JSON wire format, distributed).
  */
class SinksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("trim overflow archives to partitioned jsonl and restores losslessly") {
    import org.apache.spark.sql.functions._
    val events = Tables(spark, TestSpark.sfDir).events
    val overflow = EventOps.withTsUs(events)
      .select(col("event_id"), col("ts_us"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .filter(col("user_id") < 5)
    val dir = Files.createTempDirectory("graft-archive").toString
    Sinks.archiveJsonl(overflow, dir)

    val restored = Sinks.eventsFromJsonl(spark, dir)
    assert(restored.count() == overflow.count())
    val a = overflow.select("event_id", "ts_us", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    val b = restored.select("event_id", "ts_us", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
    // partitioned layout: one directory per stream
    assert(new java.io.File(dir).listFiles().count(_.getName.startsWith("user_id=")) == 5)
  }

  test("archived jsonl directory replays as a live stream through the bus") {
    import org.apache.spark.sql.functions._
    val events = Tables(spark, TestSpark.sfDir).events
    val sample = EventOps.withTsUs(events)
      .select(col("event_id"), col("ts_us"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .limit(200)
    val dir = Files.createTempDirectory("graft-replay").toString
    sample.coalesce(2).write.mode("overwrite").json(dir)

    val stream = graft.streaming.EventStreamJobs.archiveStream(spark, dir)
    val routed = graft.streaming.EventStreamJobs.route(
      stream, EventOps.handlerRegistry(spark))
    val q = routed.writeStream.format("memory").queryName("replayed")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val n = spark.table("replayed").count()
      // purchases fan out to two handlers, so replay ≥ source rows
      assert(n >= 200)
      assert(spark.table("replayed").filter(col("handler") === "unhandled").count() > 0)
    } finally q.stop()
  }

  test("date-partitioned event store prunes partitions at the scan") {
    import org.apache.spark.sql.functions._
    val events = Tables(spark, TestSpark.sfDir).events
    val dir = Files.createTempDirectory("graft-events-part").toString
    Sinks.writeEventsPartitioned(events, dir)

    val filtered = spark.read.parquet(dir)
      .filter(col("event_date") === lit("2024-01-05").cast("date"))
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(event_date"),
      s"expected partition pruning, got:\n$scan")
    // pruned read matches a full-scan filter
    val expected = events.filter(to_date(col("ts")) === lit("2024-01-05").cast("date")).count()
    assert(filtered.count() == expected && expected > 0)
  }

  test("JSONL corpus round-trip and sharded training-set write") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = (0L until 60L).map(i =>
      (i, s"doc body $i", "en", s"src${i % 3}", (9 + i % 4)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // JSONL round-trip with the explicit schema (no inference pass)
    val dumpDir = Files.createTempDirectory("graft-docs-jsonl").toString
    docs.write.mode("overwrite").json(dumpDir)
    val back = Sinks.documentsFromJsonl(spark, dumpDir)
    assert(back.schema == Sinks.docJsonSchema)
    assert(back.orderBy("doc_id").collect().map(_.getLong(0)).toSeq ==
      (0L until 60L).toSeq)
    // sharded write: one directory per shard, content = shardShuffle
    val shardDir = Files.createTempDirectory("graft-shards").toString
    Sinks.writeTrainingShards(docs, shardDir, nShards = 4)
    val stored = spark.read.option("basePath", shardDir).json(shardDir)
      .select(col("shard").cast("long"), col("pos").cast("long"),
        col("doc_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val expect = graft.operators.Sampling.shardShuffle(docs, nShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(stored == expect)
    val dirs = new java.io.File(shardDir).listFiles.filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard=")).sorted
    assert(dirs.length == 4)
  }
}
