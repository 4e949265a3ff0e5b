package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: print the formatted physical plan of named SparkEntry
  * queries (all queries when none named) — the `.explain` audit loop
  * behind PLANS.md. Usage:
  * `runMain graft.Explain <sfDir> [queryName ...]`
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"\n===== $name =====")
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          try fn(spark, sfDir).explain("formatted")
          catch { case e: Throwable => println(s"error: ${e.getMessage}") }
        case None => println("unknown query")
      }
    }
    spark.stop()
  }
}
