package graft.events

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import graft.TestSpark
import graft.sources.{EventStreamServer, EventStreamClient, EventsTable}

/** reflexpb wire parity (reference: reflexpb/reflex.proto, protocp.go,
  * server.go/client.go): golden frame bytes, round-trips, unknown-
  * field tolerance, and the full serve→Recv→consume stream over the
  * binary transport including reconnect resume.
  */
class ReflexPbSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("encodeEvent emits the reference proto encoder's exact bytes (golden)") {
    // Event{type=1, timestamp{seconds=1}, foreign_id="41", id="7"},
    // zero-valued value/metadata/trace omitted (proto3): field 3 tag
    // 0x18 varint 1; field 4 tag 0x22 nested Timestamp [08 01];
    // field 5 tag 0x2A "41"; field 6 tag 0x32 "7"
    val expected = Array[Int](
      0x18, 0x01,
      0x22, 0x02, 0x08, 0x01,
      0x2a, 0x02, '4', '1',
      0x32, 0x01, '7').map(_.toByte)
    val got = ReflexPb.encodeEvent(7L, "click", 41L, 1000L, 0.0, "")
    assert(got.toSeq === expected.toSeq)
  }

  test("event round-trips including the graft value extension and trace") {
    val trace = Tracing.marshal(SpanContext("0af7651916cd43dd8448eb211c80319c", "b7ad6b7169203331"))
    val b = ReflexPb.encodeEvent(99L, "purchase", 7L, 1704067200123L, 2.5,
      """{"k":"v"}""", trace)
    val e = ReflexPb.decodeEvent(b).get
    assert(e === ReflexPb.PbEvent(99L, "purchase", 7L, 1704067200123L, 2.5,
      """{"k":"v"}""", e.trace))
    assert(e.trace.toSeq === trace.toSeq)
    // the trace payload survives the event frame intact
    assert(Tracing.unmarshal(e.trace).map(_.traceId) ===
      Some("0af7651916cd43dd8448eb211c80319c"))
  }

  test("decode skips unknown fields and reserved ids; bad frames are None") {
    val base = ReflexPb.encodeEvent(5L, "view", 1L, 1000L, 0.0, "")
    // prepend reserved field 1 (varint) and append unknown field 12 (bytes)
    val extended = Array[Byte](0x08, 0x2a) ++ base ++ Array[Byte](0x62, 0x02, 1, 2)
    assert(ReflexPb.decodeEvent(extended).map(_.id) === Some(5L))
    // truncated length prefix → None, not an exception
    assert(ReflexPb.decodeEvent(Array[Byte](0x32, 0x7f, 'x')).isEmpty)
    // non-numeric remote id → None (int64 log-key boundary)
    val w = new graft.util.ProtoWire.Writer()
    w.string(6, "evt-abc").string(5, "1")
    assert(ReflexPb.decodeEvent(w.result()).isEmpty)
  }

  test("unknown type codes fall back to the code string; code 0 is noop") {
    val b = ReflexPb.encodeEvent(1L, "777", 2L, 1000L, 0.0, "",
      enum = Seq(EventType.Of(777, "777")))
    assert(ReflexPb.decodeEvent(b).map(_.eventType) === Some("777"))
    val noop = ReflexPb.encodeEvent(2L, "noop", 3L, 1000L, 0.0, "")
    assert(ReflexPb.decodeEvent(noop).map(_.eventType) === Some("noop"))
  }

  test("StreamRequest round-trips options: after, toHead, fromHead, lag") {
    val b = ReflexPb.encodeStreamRequest(42L, toHead = true, fromHead = true, lagMs = 1500L)
    assert(ReflexPb.decodeStreamRequest(b) ===
      Some(ReflexPb.PbStreamRequest(42L, toHead = true, fromHead = true, lagMs = 1500L)))
    // minimal request: just the cursor
    assert(ReflexPb.decodeStreamRequest(ReflexPb.encodeStreamRequest(-1L)) ===
      Some(ReflexPb.PbStreamRequest(-1L, toHead = false, fromHead = false, lagMs = 0L)))
  }

  private def mkTable(n: Int): EventsTable = {
    val dir = Files.createTempDirectory("graft-pb").resolve("log").toString
    val table = new EventsTable(spark, dir)
    import spark.implicits._
    table.insert((0 until n).map { i =>
      ("click", (i % 3).toLong, java.sql.Timestamp.valueOf(f"2024-01-01 00:${i % 60}%02d:00"), i.toDouble, "{}")
    }.toDF("eventType", "foreignId", "ts", "value", "metadata"))
    table
  }

  test("binary server streams delimited reflexpb events past the cursor") {
    val table = mkTable(10)
    val server = new EventStreamServer(() => table.log.df, binary = true)
    try {
      val sock = new java.net.Socket("localhost", server.boundPort)
      val out = sock.getOutputStream
      graft.util.ProtoWire.writeDelimited(out,
        ReflexPb.encodeStreamRequest(3L, toHead = true))
      out.flush()
      val in = sock.getInputStream
      val evs = Iterator.continually(ReflexPb.readEventFrom(in))
        .takeWhile(_.nonEmpty).map(_.get).toSeq
      sock.close()
      assert(evs.map(_.id) === (4L to 9L))
      assert(evs.map(_.value) === (4L to 9L).map(_.toDouble))
      assert(evs.forall(_.eventType == "click"))
    } finally server.close()
  }

  test("pb relay feeds the stock consume loop; reconnect resumes mid-stream") {
    val table = mkTable(10)
    val server = new EventStreamServer(() => table.log.df, binary = true)
    def readIds(port: Int): Seq[Long] = {
      val sock = new java.net.Socket("localhost", port)
      try {
        val in = new java.io.BufferedReader(
          new java.io.InputStreamReader(sock.getInputStream, "UTF-8"))
        Iterator.continually(in.readLine()).takeWhile(_ != null)
          .map(l => """"id":(\d+)""".r.findFirstMatchIn(l).get.group(1).toLong)
          .toSeq
      } finally sock.close()
    }
    val (port, closeRelay) = EventStreamClient.relayPb(
      "localhost", server.boundPort, after = -1L, toHead = true)
    try {
      assert(readIds(port) === (0L to 9L))
      import spark.implicits._
      table.insert((0 until 4).map { i =>
        ("click", 0L, java.sql.Timestamp.valueOf(f"2024-01-02 00:0$i%d:00"), 1.0, "{}")
      }.toDF("eventType", "foreignId", "ts", "value", "metadata"))
      // reconnect re-issues the StreamRequest from the last forwarded
      // id — the consumed prefix must not cross the wire again
      assert(readIds(port) === (10L to 13L))
    } finally { closeRelay(); server.close() }
  }
}
