package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files
import graft.TestSpark
import graft.events._

class ErrorsTableSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ErrorsTable: record -> latest-status view -> markStatus lifecycle") {
    val dir = Files.createTempDirectory("graft-errt").resolve("errors").toString
    val et = new ErrorsTable(spark, dir)

    val id1 = et.recordReturningId("c1", 41L, "boom \"quoted\"\nline2")
    val id2 = et.recordReturningId("c1", 42L, "second")
    et.recordReturningId("c2", 43L, "other consumer")

    // all errors start in status 1 (recorded)
    val all = et.errors().collect()
    assert(all.length === 3)
    assert(all.forall(_.getAs[Int]("status") === 1))
    // escaping survives the JSON round-trip
    assert(et.errors().filter(col("error_id") === id1)
      .select("msg").collect().head.getString(0) === "boom \"quoted\"\nline2")

    // mark one processed; a later duplicate status change wins
    et.markStatus(id1, 2)
    val afterMark = et.errors().collect()
      .map(r => r.getAs[Long]("error_id") -> r.getAs[Int]("status")).toMap
    assert(afterMark(id1) === 2)
    assert(afterMark(id2) === 1)

    assert(et.list("c1").map(_._1) === Seq(41L, 42L))

    // nonexistent error id: reference UPDATE affects 0 rows — no
    // orphan error_status event is appended here either
    val headBefore = et.table.head
    et.markStatus(9999L, 2)
    assert(et.table.head === headBefore)
  }

  test("DeadLetter mode wires to ErrorsTable; a retry processor consumes the error stream") {
    val base = Files.createTempDirectory("graft-errt2")
    val logDir = base.resolve("log").toString
    val errDir = base.resolve("errors").toString
    val table = new EventsTable(spark, logDir)
    val et = new ErrorsTable(spark, errDir)

    import spark.implicits._
    table.insert(Seq(
      ("signup", 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0, "{}"),
      ("click", 2L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 2.0, "{}"))
      .toDF("eventType", "foreignId", "ts", "value", "metadata"))

    // a consumer that always fails dead-letters its batch durably
    val store = new MemCursorStore()
    Runner.runToHead(Spec(table.log, store,
      Consumer("flaky", _ => throw new RuntimeException("kaput"),
        errorMode = DeadLetter(retries = 1, errors = et))))
    // cursor advanced past the poisoned batch; the error is durable
    assert(store.get("flaky").isDefined)
    val recorded = et.errors().filter(col("consumer") === "flaky").collect()
    assert(recorded.length === 1)
    assert(recorded.head.getAs[String]("msg") === "kaput")

    // reflex-style retry processor: CONSUME the error log like any
    // other event stream (grpc-error-table parity: errors are events)
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    Runner.runToHead(Spec(et.stream, new MemCursorStore(),
      Consumer("retrier", b =>
        b.filter(col("eventType") === "error_recorded")
          .select("id").collect().foreach(r => seen += r.getLong(0)))))
    assert(seen.size === 1)
    et.markStatus(seen.head, 2)
    assert(et.errors().filter(col("consumer") === "flaky")
      .select("status").collect().head.getInt(0) === 2)
  }

  test("WithErrorRecordOnly: records persist, the stream surface is silent") {
    val dir = Files.createTempDirectory("graft-errt3").resolve("errors").toString
    val et = new ErrorsTable(spark, dir, Seq(ErrorsTable.RecordOnly))

    val id = et.recordReturningId("c1", 7L, "kaput")
    et.markStatus(id, 2)

    // the durable record lifecycle is intact (rsql record-only still
    // INSERTs + UPDATEs the consumer_errors rows)
    val rows = et.errors().collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Int]("status") === 2)

    // ...but nothing streams: no error_recorded, no error_status —
    // a retry processor attached to the stream surface sees zero events
    assert(et.stream.df.isEmpty)
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    Runner.runToHead(Spec(et.stream, new MemCursorStore(),
      Consumer("retrier", b =>
        b.select("eventType").collect().foreach(r => seen += r.getString(0)))))
    assert(seen.isEmpty)
  }

  test("custom inserter seams: ErrorInserter replaces the record write, ErrorEventInserter tees, ErrorCounter counts") {
    val base = Files.createTempDirectory("graft-errt4")
    val et = new ErrorsTable(spark, base.resolve("errors").toString)
    val teeTable = new EventsTable(spark, base.resolve("tee").toString)

    import spark.implicits._
    val recorded = scala.collection.mutable.ArrayBuffer.empty[(String, Long, String)]
    var counted = 0
    val custom = new ErrorsTable(spark, base.resolve("custom").toString, Seq(
      ErrorsTable.ErrorInserter { (c, eid, msg) =>
        recorded += ((c, eid, msg)); 1000L + recorded.size
      },
      ErrorsTable.ErrorEventInserter { (c, eid, _) =>
        teeTable.insert(Seq(("consumer_error", eid,
          java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 0.0,
          s"""{"consumer":"$c"}"""))
          .toDF("eventType", "foreignId", "ts", "value", "metadata")); ()
      },
      ErrorsTable.ErrorCounter(_ => counted += 1)))

    assert(custom.recordReturningId("cX", 11L, "m1") === 1001L)
    assert(custom.recordReturningId("cX", 12L, "m2") === 1002L)
    // the custom inserter owns persistence: the default log saw
    // nothing (its backing table was never even created)
    assert(custom.table.head === -1L)
    assert(recorded.toSeq === Seq(("cX", 11L, "m1"), ("cX", 12L, "m2")))
    // the tee received one companion event per record
    assert(teeTable.log.df.filter(col("eventType") === "consumer_error")
      .count() === 2L)
    assert(counted === 2)
    // the default-wired table is unaffected by the custom one
    et.record("cY", 13L, "m3")
    assert(et.errors().count() === 1L)
  }
}
