package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Bucketing, Tables}

/** Co-located join via bucketing: both sides pre-bucketed on the join
  * key ⇒ the join plan contains no shuffle exchange at all.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed fact tables join without any shuffle exchange") {
    val t = Tables(spark, TestSpark.sfDir)
    Bucketing.writeBucketed(t.lineitem, "lineitem_b", "l_orderkey", 4)
    Bucketing.writeBucketed(t.orders, "orders_b", "o_orderkey", 4)

    // force a sort-merge join so the exchange question is real; the
    // join-only plan must contain zero shuffle exchanges (the later
    // groupBy on a non-bucket key legitimately shuffles once)
    val joinOnly = Bucketing.table(spark, "lineitem_b").hint("merge")
      .join(Bucketing.table(spark, "orders_b").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = joinOnly.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected shuffle-free bucketed join, got:\n$plan")
    assert(plan.contains("SortMergeJoin"))

    val joined = joinOnly
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))

    // and it computes the same result as the plain parquet join
    val expected = t.lineitem.join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expected)
  }

  test("user-bucketed event store runs sessionization without a shuffle") {
    val t = Tables(spark, TestSpark.sfDir)
    Bucketing.writeBucketed(t.events, "events_b", "user_id", 4)
    val sessions = graft.operators.EventOps.sessionGap(
      Bucketing.table(spark, "events_b"))
    // the user-keyed window AND the (user, session) groupBy both ride
    // the bucket partitioning — the only exchange left is the final
    // presentation orderBy (rangepartitioning), never a hash shuffle
    val plan = sessions.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected shuffle-free bucketed sessionization, got:\n$plan")
    val expected = graft.operators.EventOps.sessionGap(t.events)
      .collect().map(_.toSeq).toSeq
    assert(sessions.collect().map(_.toSeq).toSeq == expected)
  }
}
