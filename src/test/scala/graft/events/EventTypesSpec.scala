package graft.events

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class EventTypesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import EventType.Known._

  test("IsType / IsAnyType follow the reference's int-code contract") {
    assert(EventType.isType(Purchase, EventType.Of(4, "other-name")))
    assert(!EventType.isType(Purchase, Click))
    assert(EventType.isAnyType(Error, Purchase, Error))
    assert(!EventType.isAnyType(View, Purchase, Error))
  }

  test("typed filters select the same rows as string filters") {
    val log = EventLog(spark, TestSpark.sf)
    val typed = log.where(EventType.ofAnyType(Purchase, Error)).df.count()
    val strings = log.where(EventFilter.ofAnyType("purchase", "error")).df.count()
    assert(typed === strings && typed > 0)
  }

  test("codeColumn maps names to codes, unknown to -1") {
    val df = EventLog(spark, TestSpark.sf).df
      .withColumn("code", EventType.codeColumn(col("eventType")))
    assert(df.filter(col("code") === -1).count() === 0)
    val purchase = df.filter(col("eventType") === "purchase")
      .select("code").distinct().collect()
    assert(purchase.map(_.getInt(0)).toSeq === Seq(4))
  }

  test("idempotent sink: replayed batch does not duplicate") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val batch = EventLog(spark, TestSpark.sf).df.limit(100)
    graft.streaming.StreamOps.idempotentParquetSink(dir)(batch, 7L)
    graft.streaming.StreamOps.idempotentParquetSink(dir)(batch, 7L) // replay
    assert(spark.read.parquet(dir).count() === 100L)
  }
}
