package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Durable consumer-error table (reference: rsql/errorstable.go — a
  * SQL errors table holding ConsumerError{id, consumer, eventID, msg,
  * createdAt, updatedAt, status} PLUS an error event inserted into a
  * companion events table so error handling is itself streamable).
  *
  * Spark-first mapping: the error log IS an EventsTable — one
  * append-only atomic log where an error record is an `error_recorded`
  * event (metadata = the ConsumerError JSON) and every status change
  * is an `error_status` event pointing at the original error's event
  * id. The mutable-row UPDATE of the reference becomes event-sourcing;
  * `errors()` is the latest-status view (the same latest-state-per-fid
  * pattern the engine already ships), and a retry processor is just a
  * reflex consumer of this log — cursor, filters, dead-lettering and
  * all. Statuses follow api.go:203: 1 = recorded (initial); this
  * table adds 2 = processed for the mark-done transition the
  * reference performs via its status UPDATE.
  */
final class ErrorsTable(spark: SparkSession, dir: String,
    options: Seq[ErrorsTable.Opt] = Nil)
    extends graft.events.ErrorStore {

  val table = new EventsTable(spark, dir)

  private val recordOnly = options.contains(ErrorsTable.RecordOnly)
  private val customInserter = options.collectFirst {
    case ErrorsTable.ErrorInserter(f) => f
  }
  private val eventInserter = options.collectFirst {
    case ErrorsTable.ErrorEventInserter(f) => f
  }
  private val counter = options.collectFirst {
    case ErrorsTable.ErrorCounter(f) => f
  }

  /** The streamable companion surface a retry processor consumes
    * (rsql errorstable.go: the default eventInserter writes a
    * companion `<errors>_events` table; this event-sourced mapping
    * exposes the records log itself — zero copies). Under
    * `RecordOnly` (rsql WithErrorRecordOnly) the records still
    * persist and `errors()` still reports the full lifecycle, but
    * this surface is EMPTY — nothing to stream, exactly the
    * reference's nullEventInserter.
    */
  def stream: graft.events.EventLog =
    if (recordOnly) new graft.events.EventLog(table.log.df.limit(0))
    else table.log

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")

  /** Record a consumer error; returns the error id (the log event id,
    * like the reference returns the inserted row id).
    */
  def record(consumerName: String, eventId: Long, msg: String): Unit = {
    recordReturningId(consumerName, eventId, msg); ()
  }

  def recordReturningId(consumerName: String, eventId: Long, msg: String): Long = {
    import spark.implicits._
    val id = customInserter match {
      case Some(f) => f(consumerName, eventId, msg)
      case None =>
        val meta =
          s"""{"consumer":"${esc(consumerName)}","event_id":$eventId,"msg":"${esc(msg)}","status":1}"""
        table.insert(Seq(
          ("error_recorded", eventId, new java.sql.Timestamp(System.currentTimeMillis()), 0.0, meta))
          .toDF("eventType", "foreignId", "ts", "value", "metadata"))
    }
    // rsql WithErrorEventInserter: a custom companion-event emission
    // (tee into the caller's own events table). The default needs no
    // call — the record IS the stream event here.
    eventInserter.foreach(f => f(consumerName, eventId, msg))
    counter.foreach(f => f(consumerName))
    id
  }

  /** Append a status-change event for an existing error id (the
    * reference's UPDATE ... SET status; 2 = processed). A nonexistent
    * error id is a no-op — the reference's UPDATE would affect 0 rows,
    * so no orphan `error_status` event is appended either.
    */
  def markStatus(errorId: Long, status: Int): Unit = {
    import spark.implicits._
    val exists = !table.log.df
      .filter(col("eventType") === "error_recorded" && col("id") === errorId)
      .isEmpty
    if (!exists) return
    table.insert(Seq(
      ("error_status", errorId, new java.sql.Timestamp(System.currentTimeMillis()), status.toDouble, "{}"))
      .toDF("eventType", "foreignId", "ts", "value", "metadata"))
    ()
  }

  /** Latest-status view: one row per recorded error with its current
    * status (latest `error_status` event wins; none → recorded=1).
    */
  def errors(): DataFrame = {
    val df = table.log.df
    val recorded = df.filter(col("eventType") === "error_recorded")
      .select(col("id").as("error_id"), col("foreignId").as("event_id"),
        get_json_object(col("metadata"), "$.consumer").as("consumer"),
        get_json_object(col("metadata"), "$.msg").as("msg"))
    val w = Window.partitionBy("foreignId").orderBy(col("id").desc)
    val statuses = df.filter(col("eventType") === "error_status")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("foreignId").as("error_id"), col("value").cast("int").as("st"))
    recorded.join(statuses, Seq("error_id"), "left")
      .withColumn("status", coalesce(col("st"), lit(1)))
      .drop("st")
  }

  def list(consumerName: String): Seq[(Long, String)] =
    errors().filter(col("consumer") === consumerName)
      .orderBy("error_id")
      .select("event_id", "msg")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
}

/** Functional options mirroring rsql/errorstable.go's ErrorsOption
  * family (:135 WithErrorInserter, :144 WithErrorEventInserter, :152
  * WithErrorRecordOnly, :160 WithErrorCounter). Field-name options
  * (:69-129) have no counterpart by design: the event-sourced mapping
  * has no SQL column names to rebind — `errors()` is a view, renames
  * are a `.withColumnRenamed` at the call site.
  */
object ErrorsTable {
  sealed trait Opt

  /** Record errors durably but do NOT enable streaming of them: the
    * `stream` surface stays empty (rsql nullEventInserter).
    */
  case object RecordOnly extends Opt

  /** Custom record insertion seam: (consumer, eventId, msg) → error
    * id. Replaces the default `error_recorded` append; `errors()`
    * only sees what the custom inserter chooses to write.
    */
  final case class ErrorInserter(f: (String, Long, String) => Long) extends Opt

  /** Custom companion-event emission, called after each record —
    * the tee-into-your-own-events-table seam.
    */
  final case class ErrorEventInserter(f: (String, Long, String) => Unit) extends Opt

  /** Counts successfully recorded errors per consumer (rsql
    * WithErrorCounter; default metric lives in Consumer metrics).
    */
  final case class ErrorCounter(f: String => Unit) extends Opt
}
