package graft.util

import org.scalatest.funsuite.AnyFunSuite

/** RFC 7540 layout conformance for the frame codec: golden bytes for
  * the 9-octet frame header (§4.1), the connection preface (§3.5),
  * SETTINGS payload layout (§6.5.1), WINDOW_UPDATE/RST/GOAWAY
  * payloads, and the padding/priority envelope (§6.1/§6.2).
  */
class Http2FramingSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("client preface is the RFC 7540 §3.5 magic") {
    assert(new String(Http2.Preface, "ISO-8859-1") ==
      "PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n")
    assert(Http2.Preface.length == 24)
  }

  test("frame header golden layout: length/type/flags/streamId") {
    val out = new java.io.ByteArrayOutputStream()
    Http2.writeFrame(out, Http2.Data, Http2.FlagEndStream, 1,
      "hello".getBytes("ISO-8859-1"))
    // 00 00 05 (len) 00 (DATA) 01 (END_STREAM) 00 00 00 01 (stream 1)
    assert(out.toByteArray.toSeq == hex("00 00 05 00 01 00 00 00 01 68 65 6c 6c 6f").toSeq)
    val in = new java.io.ByteArrayInputStream(out.toByteArray)
    val f = Http2.readFrame(in).get
    assert(f.tpe == Http2.Data && f.flags == 1 && f.streamId == 1)
    assert(new String(f.payload, "ISO-8859-1") == "hello")
  }

  test("reserved bit of the stream id is masked on read and write") {
    val out = new java.io.ByteArrayOutputStream()
    // stream id with the high (reserved) bit set must be written masked
    Http2.writeFrame(out, Http2.Ping, 0, 0x80000003)
    val b = out.toByteArray
    assert((b(5) & 0x80) == 0)
    // and a peer setting it on the wire is ignored on read (RFC §4.1)
    val wire = hex("00 00 00 06 00 80 00 00 03")
    val f = Http2.readFrame(new java.io.ByteArrayInputStream(wire)).get
    assert(f.streamId == 3)
  }

  test("SETTINGS payload: 16-bit id + 32-bit value, big endian") {
    val p = Http2.settingsPayload(Seq(
      Http2.SettingsMaxFrameSize -> 16384L,
      Http2.SettingsInitialWindowSize -> 65535L))
    assert(p.toSeq == hex("00 05 00 00 40 00 00 04 00 00 ff ff").toSeq)
    val parsed = Http2.parseSettings(p)
    assert(parsed == Map(Http2.SettingsMaxFrameSize -> 16384L,
      Http2.SettingsInitialWindowSize -> 65535L))
  }

  test("WINDOW_UPDATE / RST_STREAM / GOAWAY payload layouts") {
    assert(Http2.windowUpdatePayload(65535).toSeq == hex("00 00 ff ff").toSeq)
    assert(Http2.parseWindowUpdate(hex("00 01 00 00")) == 65536)
    assert(Http2.rstPayload(Http2.ErrCancel).toSeq == hex("00 00 00 08").toSeq)
    assert(Http2.goAwayPayload(5, Http2.ErrProtocol).toSeq ==
      hex("00 00 00 05 00 00 00 01").toSeq)
  }

  test("unpad strips padding and HEADERS priority envelope") {
    // DATA with PADDED: padLen=2, body "ab", pad bytes
    val padded = Http2.Frame(Http2.Data, Http2.FlagPadded, 1,
      hex("02 61 62 00 00"))
    assert(new String(Http2.unpad(padded), "ISO-8859-1") == "ab")
    // HEADERS with PRIORITY: 5-octet dependency/weight before fragment
    val prio = Http2.Frame(Http2.Headers, Http2.FlagPriority, 1,
      hex("80 00 00 00 0f 82"))
    assert(Http2.unpad(prio).toSeq == hex("82").toSeq)
    // both at once: pad length first, then priority, then fragment
    val both = Http2.Frame(Http2.Headers,
      Http2.FlagPadded | Http2.FlagPriority, 1,
      hex("01 80 00 00 00 0f 82 00"))
    assert(Http2.unpad(both).toSeq == hex("82").toSeq)
  }

  test("readFrame returns None at EOF and rejects oversized frames") {
    assert(Http2.readFrame(new java.io.ByteArrayInputStream(Array.emptyByteArray)).isEmpty)
    // 24-bit length far above maxFrame
    val huge = hex("ff ff ff 00 00 00 00 00 01")
    assert(Http2.readFrame(new java.io.ByteArrayInputStream(huge), 16384).isEmpty)
  }
}
