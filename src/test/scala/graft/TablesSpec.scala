package graft

import org.scalatest.funsuite.AnyFunSuite

/** Loader-contract tests for the parquet table readers — the ns→µs
  * normalization semantics the round-5 ADVICE items pinned down.
  */
class TablesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("events loader floors ns→µs like DuckDB, including pre-epoch timestamps") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tables").toString
    // nanos-as-long physical shape, with pre-epoch values where
    // truncate-toward-zero and floor DISAGREE: -1500 ns is -2 µs under
    // DuckDB's flooring `//`, -1 µs under `div`
    Seq(
      (1L, -1L), // -1 ns → floor = -1 µs
      (2L, -1500L), // → -2 µs (truncation would say -1)
      (3L, -1000L), // exact boundary → -1 µs
      (4L, 1500L), // post-epoch: → 1 µs either way
      (5L, 0L))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = sources.Tables(spark, dir).events
      .select($"event_id", org.apache.spark.sql.functions.unix_micros($"ts"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> -1L, 2L -> -2L, 3L -> -1L, 4L -> 1L, 5L -> 0L))
  }

  test("events loader fails fast on an unexpected physical type for ts") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tables").toString
    Seq((1L, "not-a-timestamp")).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalArgumentException](sources.Tables(spark, dir).events)
    assert(e.getMessage.contains("generator drift"))
  }
}
