package graft.events

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class EventLogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val log = EventLog(spark, TestSpark.sf)

  test("head is the max event id") {
    assert(log.head() === 999L)
  }

  test("after(cursor) returns only events strictly past the cursor, ordered") {
    val ids = log.after(990L).select("id").collect().map(_.getLong(0))
    assert(ids.toSeq === (991L to 999L))
  }

  test("toHead is a bounded replay") {
    assert(log.toHead(900L).count() === 99L)
  }

  test("fromHead on a static log is empty") {
    assert(log.fromHead().isEmpty)
  }

  test("lag excludes the newest events") {
    val maxTs = log.df.agg(max("ts")).collect()(0).getTimestamp(0)
    val lagged = log.withLag(3600L, lit(maxTs))
    assert(lagged.count() < log.df.count())
    val newest = lagged.agg(max("ts")).collect()(0).getTimestamp(0)
    assert(newest.getTime <= maxTs.getTime - 3600L * 1000)
  }

  test("empty include-type filter consumes everything (reference consumer.go:207)") {
    assert(log.where(EventFilter.ofAnyType()).df.count() === log.df.count())
  }

  test("filters compose and push down") {
    val f = EventFilter.ofAnyType("purchase", "error") && EventFilter.Raw(col("foreignId") < 10)
    val rows = log.where(f).df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => Set("purchase", "error")(r.getAs[String]("eventType"))))
    assert(rows.forall(_.getAs[Long]("foreignId") < 10))
  }

  test("metadata filter composes with type filters") {
    val f = EventFilter.metadataInt("$.k")(k => k < 10) && EventFilter.ofType("click")
    val rows = log.where(f).df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("eventType") === "click")
      val k = r.getAs[String]("metadata") // {"k": n}
      assert(k.replaceAll("[^0-9]", "").toInt < 10)
    }
  }

  test("shard filters partition the log completely and disjointly") {
    val n = 4
    val counts = (0 until n).map { m =>
      log.where(EventFilter.shardMofN(m, n)).df.count()
    }
    assert(counts.sum === log.df.count())
    assert(counts.forall(_ > 0))
  }
}
