package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}

class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("latestState over a foreignId-bucketed log runs without a shuffle") {
    import graft.events.{Event, Patterns}
    val events = Event.project(
      spark.read.parquet(s"${TestSpark.sf}/events.parquet"))
    Bucketing.writeBucketed(events, "b_events", "foreignId", 8)
    val plan = Patterns.latestState(spark.table("b_events"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed window should not shuffle:\n$plan")
    assert(Patterns.latestState(spark.table("b_events")).count() ===
      Patterns.latestState(events).count())
  }

  test("same-bucketed tables join without a shuffle exchange") {
    Bucketing.writeBucketed(
      Tables.orders(spark, TestSpark.sf).select("o_orderkey", "o_orderstatus"),
      "b_orders", "o_orderkey", 8)
    Bucketing.writeBucketed(
      Tables.lineitem(spark, TestSpark.sf)
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "b_lineitem", "o_orderkey", 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected no shuffle exchange in:\n$plan")
      // still correct
      assert(joined.count() ===
        Tables.lineitem(spark, TestSpark.sf).join(
          Tables.orders(spark, TestSpark.sf),
          col("l_orderkey") === col("o_orderkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
