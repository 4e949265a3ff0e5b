package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.sources.Tables

/** Scratch profiler: decompose the targeted salted join's uniform-data
  * overhead — detection pass vs join shape — so the "degenerates to
  * the plain join" claim is measured, not asserted (dev tool; PLANS.md
  * and SCALING.md record the verdict).
  */
object ProfileSalted {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1rep")
    val spark = GraftSession.local(32)
    val t = Tables(spark, sfDir)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String, reps: Int = 3)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $label%-34s min ${ts.min}%6.2f s  max ${ts.max}%6.2f s")
    }
    time("plain join")(noop(Relational.q24PlainJoin(t.lineitem, t.orders)))
    time("detection pass alone")(noop(Relational.hotJoinKeys(t.lineitem)))
    time("targeted as-is")(noop(Relational.q24SaltedJoin(t.lineitem, t.orders)))
    // the join shape with detection REPLACED by a known-empty hot set:
    // isolates what the salt plumbing itself costs when nothing salts
    val emptyHot = spark.range(0).select(col("id").as("hot_key"))
    time("salt shape, empty hot set") {
      val l = t.lineitem
        .join(broadcast(emptyHot), col("l_orderkey") === col("hot_key"), "left")
        .withColumn("salt", when(col("hot_key").isNotNull,
          pmod(hash(col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_suppkey")), lit(8))).otherwise(lit(0)))
        .drop("hot_key")
      val o = t.orders
        .join(broadcast(emptyHot), col("o_orderkey") === col("hot_key"), "left")
        .withColumn("salt", explode(when(col("hot_key").isNotNull,
          sequence(lit(0), lit(7))).otherwise(array(lit(0)))))
        .drop("hot_key")
      noop(l.join(o, l("l_orderkey") === o("o_orderkey") && l("salt") === o("salt"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice")).as("revenue"))
        .orderBy(col("o_orderstatus")))
    }
    // same, but salt derived WITHOUT the explode on the dim side
    time("salt shape, no-explode dim") {
      val l = t.lineitem.withColumn("salt", lit(0))
      val o = t.orders.withColumn("salt", lit(0))
      noop(l.join(o, l("l_orderkey") === o("o_orderkey") && l("salt") === o("salt"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice")).as("revenue"))
        .orderBy(col("o_orderstatus")))
    }
    // the condition the operator exists for: AQE's skew split OFF
    // (stands in for the cluster cases where it cannot apply — e.g.
    // the skewed side feeding a co-partitioned downstream op)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    time("plain, AQE skew split off")(
      noop(Relational.q24PlainJoin(t.lineitem, t.orders)))
    time("targeted, AQE skew split off")(
      noop(Relational.q24SaltedJoin(t.lineitem, t.orders)))
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.stop()
  }
}
