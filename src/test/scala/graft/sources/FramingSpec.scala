package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.events.{Consumer, MemCursorStore, Spec, Runner}

/** The WireFraming seam (SURVEY §2 A49/A51 note): the cursor protocol
  * is transport- AND format-agnostic. Evidence: the full
  * Runner.runStreamFrom pipeline — cursor bootstrap, replay pruning,
  * per-batch commit — runs over a Kafka-shaped binary RECORD stream
  * in a framing no transport in this repo emits (length-prefixed
  * JSON), byte for byte the seam a real `format("kafka")` source
  * would feed.
  */
class FramingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def canonRow(id: Long, et: String, fid: Long, tsMs: Long,
      v: Double, meta: String): Row = Row(id, et, fid, tsMs, v, meta)

  private val sample = Seq(
    canonRow(0L, "click", 7L, 1700000000000L, 1.5, """{"k":"v"}"""),
    canonRow(1L, "purchase", 8L, 1700000001000L, 0.0, "{}"),
    canonRow(2L, null, 9L, 1700000002000L, 2.0, null))

  private def decodeBinary(f: WireFraming, payloads: Seq[Array[Byte]]): Seq[Row] = {
    import spark.implicits._
    f.decode(payloads.toDF("value"))
      .select(col("id"), col("eventType"), col("foreignId"),
        unix_timestamp(col("ts")).as("es"), col("value"), col("metadata"))
      .orderBy("id").collect().toSeq
  }

  test("all three framings round-trip the same canonical events identically") {
    val framings = Seq(WireFraming.LineJson, WireFraming.Pb,
      WireFraming.LengthPrefixedJson)
    val decoded = framings.map { f =>
      f.name -> decodeBinary(f, sample.map(f.encode))
    }.toMap
    // cross-framing parity: the FORMAT must not leak into the fields
    assert(decoded("line-json") === decoded("length-prefixed-json"))
    // pb encodes null metadata/eventType as proto3 defaults (absent
    // field → empty string → null-vs-empty is the one documented
    // boundary); ids/fids/ts/value must agree exactly
    val pbCore = decoded("reflexpb").map(r => (r.getLong(0), r.getLong(2),
      r.getLong(3), r.getDouble(4)))
    val jsCore = decoded("line-json").map(r => (r.getLong(0), r.getLong(2),
      r.getLong(3), r.getDouble(4)))
    assert(pbCore === jsCore)
  }

  test("length-prefixed decode drops torn records instead of killing the stream") {
    val good = sample.take(2).map(WireFraming.LengthPrefixedJson.encode)
    val torn = good(1).dropRight(3) // truncated body: header disagrees
    val short = Array[Byte](0, 1)   // shorter than the header itself
    val rows = decodeBinary(WireFraming.LengthPrefixedJson,
      Seq(good(0), torn, short, good(1)))
    assert(rows.map(_.getLong(0)) === Seq(0L, 1L))
  }

  test("runStreamFrom runs the full cursor protocol over a Kafka-shaped binary record stream") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft-framing-ckpt").toString
    val mem = MemoryStream[Array[Byte]]
    val events = (0L until 20L).map(i =>
      canonRow(i, "click", i % 3, 1700000000000L + i * 1000L, 1.0, "{}"))
    mem.addData(events.map(WireFraming.LengthPrefixedJson.encode))

    val store = new MemCursorStore()
    val seen = new AtomicLong()
    val spec = Spec(null, store, Consumer("framed", b => {
      seen.addAndGet(b.count()); ()
    }))
    val stream = WireFraming.LengthPrefixedJson.decode(mem.toDF())
    val q1 = Runner.runStreamFrom(stream, spec, ckpt, availableNow = false)
    q1.processAllAvailable()
    q1.stop()
    assert(seen.get() === 20L)
    assert(store.get("framed") === Some(19L))

    // replay from a FRESH checkpoint (the broker re-ships the topic):
    // the durable cursor prunes every consumed record, then the tail
    // past the cursor is consumed — at-least-once becomes effective
    // exactly-once above the seam
    val ckpt2 = Files.createTempDirectory("graft-framing-ckpt2").toString
    val mem2 = MemoryStream[Array[Byte]]
    val tail = (20L until 25L).map(i =>
      canonRow(i, "click", i % 3, 1700000000000L + i * 1000L, 1.0, "{}"))
    mem2.addData((events ++ tail).map(WireFraming.LengthPrefixedJson.encode))
    val q2 = Runner.runStreamFrom(
      WireFraming.LengthPrefixedJson.decode(mem2.toDF()), spec, ckpt2,
      availableNow = false)
    q2.processAllAvailable()
    q2.stop()
    assert(seen.get() === 25L, "replayed prefix must be pruned by the cursor")
    assert(store.get("framed") === Some(24L))
  }
}
