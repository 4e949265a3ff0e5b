package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decompose the flat ~0.2–0.3 s floor of `ev_echo` /
  * `ev_parse_weighted` (VERDICT r8 #6, carried): both rows cost the
  * same at sf0.1 and sf10, so the time is per-RUN overhead, not data.
  * Candidate components, each timed in isolation on a tiny corpus
  * (sf0.001 — data cost ≈ 0, overhead dominates) and at the bench
  * scale (sf0.1) for the data-dependent share:
  *
  *   blank        — spark.range(1) → noop: job submission + sink floor
  *   scan         — events scan → noop, no transforms: footer + scan setup
  *   echo_nosort  — echo minus the global orderBy
  *   echo         — the full row (adds the range-exchange SAMPLE job —
  *                  a global sort runs one extra job to sample
  *                  partition bounds before the real one)
  *   parse_nocase — parse_weighted with the registry parse replaced by
  *                  a constant (leaves scan + groupBy + orderBy)
  *   parse        — the full row (adds from_json + the schema-dispatch
  *                  case tree)
  *
  * Min over N passes, one JVM, ProfileAqe methodology. SCALING.md
  * records the verdict.
  */
object ProfileFloor {
  def main(args: Array[String]): Unit = {
    val passes = if (args.nonEmpty) args(0).toInt else 7
    val spark = GraftSession.local(32)
    def parseWeighted(dir: String): DataFrame =
      SparkEntry.queries("ev_parse_weighted")(spark, dir)
    def echoNoSort(dir: String): DataFrame = {
      val e = graft.sources.Tables(spark, dir).events
      e.select(col("event_id"), col("event_type"), col("user_id"), col("value"),
        lit("graft").as("application_name"),
        concat(lit("user-"), col("user_id").cast("string")).as("application_instance"))
    }
    def parseNoCase(dir: String): DataFrame =
      graft.sources.Tables(spark, dir).events
        .groupBy(substring(col("props"), 3, 1).as("schema_name"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("schema_name"))
    def variants(dir: String): Seq[(String, () => DataFrame)] = Seq(
      "blank" -> (() => spark.range(1).toDF("x")),
      "scan" -> (() => graft.sources.Tables(spark, dir).events),
      "echo_nosort" -> (() => echoNoSort(dir)),
      "echo" -> (() => SparkEntry.queries("ev_echo")(spark, dir)),
      "parse_nocase" -> (() => parseNoCase(dir)),
      "parse" -> (() => parseWeighted(dir)))
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")) {
      val vs = variants(dir)
      vs.foreach { case (_, f) => // warm
        f().write.format("noop").mode("overwrite").save()
      }
      val mins = vs.map { case (name, f) =>
        val ts = (1 to passes).map { _ =>
          val t0 = System.nanoTime()
          f().write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        name -> ts.min
      }
      mins.foreach { case (n, t) => println(f"[floor] $dir%-25s $n%-14s $t%7.3f s") }
    }
    spark.stop()
  }
}
