package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.events.EventLog

/** Append-only event table (reference: rsql/eventstable.go — events
  * inserted transactionally with monotonically increasing ids;
  * rsql/eventstableint.go for int foreign ids).
  *
  * Spark-first mapping: the log is a parquet directory; an insert is
  * one atomic append job (the file-commit protocol plays the role of
  * the reference's SQL transaction — readers never see a partial
  * batch). Ids are reserved as head+1..head+n and assigned with
  * zipWithIndex — per-partition offsets, no global sort, so an insert
  * of 10^9 rows assigns ids with one count and no shuffle.
  */
final class EventsTable(spark: SparkSession, dir: String) {

  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("eventType", StringType),
    StructField("foreignId", LongType),
    StructField("ts", TimestampType),
    StructField("value", DoubleType),
    StructField("metadata", StringType)))

  def exists: Boolean = new java.io.File(dir).exists()

  def log: EventLog = new EventLog(spark.read.schema(schema).parquet(dir))

  def head: Long = if (!exists) -1L else log.head()

  /** Insert a batch of events (columns: eventType, foreignId, ts,
    * value, metadata), assigning the next id range. Returns the new
    * head.
    */
  def insert(events: DataFrame): Long = {
    val base = head
    val cols = Seq("eventType", "foreignId", "ts", "value", "metadata")
    val src = events.select(cols.map(col): _*)
    val withIds = src.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq((base + 1 + i) +: r.toSeq)
    }
    spark.createDataFrame(withIds, schema)
      .write.mode(SaveMode.Append).parquet(dir)
    head
  }
}
