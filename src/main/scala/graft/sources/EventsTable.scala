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
final class EventsTable(spark: SparkSession, dir: String,
    /** partition the log by event date — at 100 TB this is what makes
      * cursor/lag slicing a partition prune instead of a full scan
      * (SURVEY.md §5); consumers near the head only open the newest
      * date partitions.
      */
    partitionByDate: Boolean = false) {

  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("eventType", StringType),
    StructField("foreignId", LongType),
    StructField("ts", TimestampType),
    StructField("value", DoubleType),
    StructField("metadata", StringType)))

  def exists: Boolean = new java.io.File(dir).exists()

  def log: EventLog = {
    val df =
      if (partitionByDate) spark.read.parquet(dir).drop("date")
      else spark.read.schema(schema).parquet(dir)
    new EventLog(df)
  }

  /** Raw frame incl. the partition column — filter on `date` to see
    * PartitionFilters pruning in the plan.
    */
  def raw: DataFrame = spark.read.parquet(dir)

  def head: Long = if (!exists) -1L else log.head()

  /** Right-to-be-forgotten compaction: rewrite the log without the
    * entity's events. Remaining ids are untouched (monotonicity
    * preserved; the resulting id gaps are exactly what the gap-fill
    * machinery tolerates — rsql/gapfill.go semantics). The rewrite is
    * an atomic directory swap, so concurrent readers see the old or
    * the new log, never a partial one.
    */
  def forget(foreignId: Long): Long = {
    val remaining = log.df.filter(col("id").isNotNull && col("foreignId") =!= foreignId)
    val tmp = dir + ".tmp"
    val writer =
      if (partitionByDate)
        remaining.withColumn("date", to_date(col("ts"))).write.partitionBy("date")
      else remaining.write
    writer.mode(SaveMode.Overwrite).parquet(tmp)
    val out = new java.io.File(dir)
    val old = new java.io.File(dir + ".old")
    deleteRec(old)
    out.renameTo(old)
    new java.io.File(tmp).renameTo(out)
    deleteRec(old)
    head
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    if (f.exists()) { f.delete(); () }
  }

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
    val df = spark.createDataFrame(withIds, schema)
    val writer =
      if (partitionByDate)
        df.withColumn("date", to_date(col("ts"))).write.partitionBy("date")
      else df.write
    writer.mode(SaveMode.Append).parquet(dir)
    head
  }
}
