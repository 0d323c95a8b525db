package graft.events

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Producers have shipped `events.ts` as three distinct physical
  * types over time: TIMESTAMP(NANOS) (read as a nanos LONG under
  * `nanosAsLong`), TIMESTAMP(MICROS, UTC) (TimestampType), and
  * TIMESTAMP(MICROS, isAdjustedToUTC=false) (TIMESTAMP_NTZ under
  * default inference). The engine must normalize all three to
  * session-TZ TimestampType with identical epoch values — this spec
  * is the regression gate for that contract.
  */
class TimestampPhysicalTypeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // 3 events, 1 hour apart, at a fixed epoch (µs precision).
  private val epochMicros = Seq(1700000000000000L, 1700003600000000L, 1700007200000000L)

  private def base: DataFrame = {
    val s = spark
    import s.implicits._
    epochMicros.zipWithIndex
      .map { case (us, i) => (i.toLong, "click", i.toLong, us, 1.0, "{}") }
      .toDF("id", "eventType", "foreignId", "us", "value", "metadata")
  }

  private def projectedEpochs(df: DataFrame): Seq[Long] = {
    val out = Event.project(df)
    assert(out.schema("ts").dataType === TimestampType,
      s"ts must normalize to TimestampType, got ${out.schema("ts").dataType}")
    // Row.getTimestamp is exactly the access pattern that broke on NTZ drift
    out.orderBy("id").collect().map(_.getTimestamp(3).getTime * 1000).toSeq
  }

  test("ns-long physical ts normalizes (nanosAsLong shape)") {
    val df = base.withColumn("ts", col("us") * 1000L).drop("us")
    assert(projectedEpochs(df) === epochMicros)
  }

  test("µs-UTC physical ts normalizes (TimestampType shape)") {
    val df = base.withColumn("ts", timestamp_micros(col("us"))).drop("us")
    assert(projectedEpochs(df) === epochMicros)
  }

  test("µs-NTZ physical ts normalizes (TIMESTAMP_NTZ shape)") {
    // session TZ is UTC, so the NTZ wall clock equals the UTC instant
    val df = base
      .withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType))
      .drop("us")
    assert(df.schema("ts").dataType === TimestampNTZType)
    assert(projectedEpochs(df) === epochMicros)
  }

  test("µs-NTZ parquet roundtrip stays Timestamp under a graft session") {
    val dir = Files.createTempDirectory("graft-ntz").toString + "/events.parquet"
    base.withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType))
      .drop("us")
      .write.mode("overwrite").parquet(dir)
    // graft sessions pin inferTimestampNTZ=false, so the µs/NTZ file
    // reads straight back as TimestampType
    val rt = spark.read.parquet(dir)
    assert(projectedEpochs(rt) === epochMicros)
    // withLag — the op that caught the drift — must run over the file
    val log = new EventLog(Event.project(rt))
    val maxTs = log.df.agg(max("ts")).collect()(0).getTimestamp(0)
    assert(log.withLag(3600L, lit(maxTs)).count() === 2L)
  }

  test("driver testdata events table projects to Timestamp") {
    val log = EventLog(spark, TestSpark.sf)
    assert(log.df.schema("ts").dataType === TimestampType)
    // the exact access that failed: getTimestamp on the aggregated max
    val maxTs = log.df.agg(max("ts")).collect()(0).getTimestamp(0)
    assert(maxTs != null)
  }
}
