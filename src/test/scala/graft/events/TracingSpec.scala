package graft.events

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Span-context codec parity with the reference
  * (internal/tracing/encode_test.go, decode_test.go): golden wire
  * bytes, round-trip cohesion, best-effort failure modes.
  */
class TracingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val traceId = "00000000000000000000000000000009"
  private val spanId = "0000000000000002"

  test("marshal emits the reference's exact wire bytes (golden)") {
    // proto wire image of Trace{trace_id, span_id}: key 0x0A (field 1,
    // len-delim), len 0x20, 32 ascii hex chars; key 0x12 (field 2),
    // len 0x10, 16 ascii hex chars — encode_test.go's expected blob
    val expected: Array[Byte] =
      (Array(0x0a, 0x20).map(_.toByte) ++ traceId.getBytes("US-ASCII") ++
        Array(0x12, 0x10).map(_.toByte) ++ spanId.getBytes("US-ASCII"))
    assert(Tracing.marshal(SpanContext(traceId, spanId)).toSeq === expected.toSeq)
  }

  test("marshal/unmarshal are cohesive; decoded context is remote") {
    val sc = SpanContext(traceId, spanId)
    val back = Tracing.unmarshal(Tracing.marshal(sc))
    assert(back === Some(SpanContext(traceId, spanId, remote = true)))
    assert(back.get.isValid)
  }

  test("unmarshal rejects what OTel id parsing rejects; inject is best-effort") {
    // all-zero ids, wrong length, uppercase hex, garbage, empty
    assert(Tracing.unmarshal(Tracing.marshal(SpanContext("0" * 32, spanId))).isEmpty)
    assert(Tracing.unmarshal(Tracing.marshal(SpanContext(traceId.take(31), spanId))).isEmpty)
    assert(Tracing.unmarshal(Tracing.marshal(
      SpanContext("0AF7651916CD43DD8448EB211C80319C", spanId))).isEmpty)
    assert(Tracing.unmarshal(Array[Byte](0x0a, 0x7f, 1, 2)).isEmpty) // truncated
    assert(Tracing.unmarshal(Array.emptyByteArray).isEmpty)
    // inject: no blob → None, undecodable blob → None, valid → Some
    assert(Tracing.inject(Event(1, "t", 1, new java.sql.Timestamp(0), 0, "{}")).isEmpty)
    assert(Tracing.inject(Event(1, "t", 1, new java.sql.Timestamp(0), 0, "{}",
      Array[Byte](9, 9, 9))).isEmpty)
    assert(Tracing.inject(Event(1, "t", 1, new java.sql.Timestamp(0), 0, "{}",
      Tracing.marshal(SpanContext(traceId, spanId)))).nonEmpty)
  }

  test("unmarshal is a conformant parser: unknown fields and varint skips") {
    // append an unknown varint field 3 (key 0x18) and an unknown
    // 64-bit field 4 (key 0x21) — a forward-compatible blob still decodes
    val extra = Tracing.marshal(SpanContext(traceId, spanId)) ++
      Array[Byte](0x18, 0x05, 0x21, 1, 2, 3, 4, 5, 6, 7, 8)
    assert(Tracing.unmarshal(extra) ===
      Some(SpanContext(traceId, spanId, remote = true)))
  }

  test("traceparent interop round-trips") {
    val sc = SpanContext(traceId, spanId, remote = true)
    assert(sc.traceparent === s"00-$traceId-$spanId-01")
    assert(Tracing.fromTraceparent(sc.traceparent) === Some(sc))
    assert(Tracing.fromTraceparent("00-bogus-ff-01").isEmpty)
    assert(Tracing.fromTraceparent(null).isEmpty)
  }

  test("declarative column decode matches the JVM codec over an event log") {
    import spark.implicits._
    val blob = Tracing.marshal(SpanContext(traceId, spanId))
    val df = Seq(
      (1L, blob),
      (2L, null.asInstanceOf[Array[Byte]]),
      (3L, Array[Byte](9, 9, 9)),
      (4L, Tracing.marshal(SpanContext("0" * 32, spanId))) // invalid ids
    ).toDF("id", "trace")
    val got = Tracing.withTraceIds(df).orderBy("id")
      .select("trace_id", "span_id").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq === Seq(
      (traceId, spanId), (null, null), (null, null), (null, null)))
    // column decode agrees with unmarshal on every row
    Tracing.withTraceIds(df).collect().foreach { r =>
      val jvm = Option(r.getAs[Array[Byte]]("trace")).flatMap(Tracing.unmarshal)
      assert(Option(r.getAs[String]("trace_id")) === jvm.map(_.traceId))
      assert(Option(r.getAs[String]("span_id")) === jvm.map(_.spanId))
    }
  }
}
