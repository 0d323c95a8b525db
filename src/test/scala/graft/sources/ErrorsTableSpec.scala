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
    Runner.runToHead(Spec(et.table.log, new MemCursorStore(),
      Consumer("retrier", b =>
        b.filter(col("eventType") === "error_recorded")
          .select("id").collect().foreach(r => seen += r.getLong(0)))))
    assert(seen.size === 1)
    et.markStatus(seen.head, 2)
    assert(et.errors().filter(col("consumer") === "flaky")
      .select("status").collect().head.getInt(0) === 2)
  }
}
