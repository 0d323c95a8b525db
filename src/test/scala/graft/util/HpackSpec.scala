package graft.util

import org.scalatest.funsuite.AnyFunSuite

/** HPACK conformance against RFC 7541's own worked examples
  * (Appendix C) — golden bytes produced by the RFC authors, so the
  * decoder is checked against cross-implementation truth, not this
  * repo's encoder. Covers: primitive integers (C.1), the literal
  * representations (C.2), request sequences plain + Huffman with
  * dynamic-table state assertions (C.3/C.4), and response sequences
  * with a 256-octet table forcing evictions, Huffman-coded (C.6).
  */
class HpackSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def decodeInt(block: Array[Byte], prefixBits: Int): Int = {
    // drive the private reader through a literal-without-indexing
    // header whose value length uses the integer coding — simpler to
    // test writeInt directly plus decode() below; here recompute by
    // the same rules for the C.1 vectors
    var i = 0
    val max = (1 << prefixBits) - 1
    var v = block(i) & max
    i += 1
    if (v == max) {
      var shift = 0
      var more = true
      while (more) {
        val b = block(i) & 0xff
        i += 1
        v += (b & 0x7f) << shift
        shift += 7
        more = (b & 0x80) != 0
      }
    }
    v
  }

  test("C.1 primitive integers: encode matches golden bytes, decode inverts") {
    def enc(first: Int, prefix: Int, v: Int): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      Hpack.writeInt(o, first, prefix, v)
      o.toByteArray
    }
    assert(enc(0, 5, 10).toSeq == hex("0a").toSeq) // C.1.1
    assert(enc(0, 5, 1337).toSeq == hex("1f 9a 0a").toSeq) // C.1.2
    assert(enc(0, 8, 42).toSeq == hex("2a").toSeq) // C.1.3
    assert(decodeInt(hex("1f 9a 0a"), 5) == 1337)
    assert(decodeInt(hex("0a"), 5) == 10)
  }

  test("C.2 literal representations") {
    val d = new Hpack.Decoder()
    // C.2.1 literal with incremental indexing
    assert(d.decode(hex("400a 6375 7374 6f6d 2d6b 6579 0d63 7573 746f 6d2d 6865 6164 6572"))
      .contains(Seq("custom-key" -> "custom-header")))
    assert(d.dynamicTable == Seq("custom-key" -> "custom-header"))
    assert(d.dynamicSize == 55)
    // C.2.2 literal without indexing (indexed name :path)
    val d2 = new Hpack.Decoder()
    assert(d2.decode(hex("040c 2f73 616d 706c 652f 7061 7468"))
      .contains(Seq(":path" -> "/sample/path")))
    assert(d2.dynamicTable.isEmpty)
    // C.2.3 literal never indexed
    val d3 = new Hpack.Decoder()
    assert(d3.decode(hex("1008 7061 7373 776f 7264 0673 6563 7265 74"))
      .contains(Seq("password" -> "secret")))
    assert(d3.dynamicTable.isEmpty)
    // C.2.4 indexed header field
    val d4 = new Hpack.Decoder()
    assert(d4.decode(hex("82")).contains(Seq(":method" -> "GET")))
  }

  test("C.3 request examples without Huffman: three requests, one connection") {
    val d = new Hpack.Decoder()
    assert(d.decode(hex("8286 8441 0f77 7777 2e65 7861 6d70 6c65 2e63 6f6d")).contains(Seq(
      ":method" -> "GET", ":scheme" -> "http", ":path" -> "/",
      ":authority" -> "www.example.com")))
    assert(d.dynamicSize == 57)
    assert(d.decode(hex("8286 84be 5808 6e6f 2d63 6163 6865")).contains(Seq(
      ":method" -> "GET", ":scheme" -> "http", ":path" -> "/",
      ":authority" -> "www.example.com", "cache-control" -> "no-cache")))
    assert(d.dynamicSize == 110)
    assert(d.decode(hex(
      "8287 85bf 400a 6375 7374 6f6d 2d6b 6579 0c63 7573 746f 6d2d 7661 6c75 65"))
      .contains(Seq(
        ":method" -> "GET", ":scheme" -> "https", ":path" -> "/index.html",
        ":authority" -> "www.example.com", "custom-key" -> "custom-value")))
    assert(d.dynamicSize == 164)
    assert(d.dynamicTable == Seq(
      "custom-key" -> "custom-value",
      "cache-control" -> "no-cache",
      ":authority" -> "www.example.com"))
  }

  test("C.4 request examples with Huffman coding") {
    val d = new Hpack.Decoder()
    assert(d.decode(hex("8286 8441 8cf1 e3c2 e5f2 3a6b a0ab 90f4 ff")).contains(Seq(
      ":method" -> "GET", ":scheme" -> "http", ":path" -> "/",
      ":authority" -> "www.example.com")))
    assert(d.dynamicSize == 57)
    assert(d.decode(hex("8286 84be 5886 a8eb 1064 9cbf")).contains(Seq(
      ":method" -> "GET", ":scheme" -> "http", ":path" -> "/",
      ":authority" -> "www.example.com", "cache-control" -> "no-cache")))
    assert(d.decode(hex(
      "8287 85bf 4088 25a8 49e9 5ba9 7d7f 8925 a849 e95b b8e8 b4bf")).contains(Seq(
      ":method" -> "GET", ":scheme" -> "https", ":path" -> "/index.html",
      ":authority" -> "www.example.com", "custom-key" -> "custom-value")))
    assert(d.dynamicSize == 164)
  }

  test("C.6 response examples with Huffman: 256-octet table forces evictions") {
    val d = new Hpack.Decoder(maxDynamicSize = 256)
    assert(d.decode(hex(
      "4882 6402 5885 aec3 771a 4b61 96d0 7abe 9410 54d4 44a8 2005 9504 0b81" +
      "66e0 82a6 2d1b ff6e 919d 29ad 1718 63c7 8f0b 97c8 e9ae 82ae 43d3")).contains(Seq(
      ":status" -> "302", "cache-control" -> "private",
      "date" -> "Mon, 21 Oct 2013 20:13:21 GMT",
      "location" -> "https://www.example.com")))
    assert(d.dynamicSize == 222)
    // second response evicts (:status, 302)
    assert(d.decode(hex("4883 640e ffc1 c0bf")).contains(Seq(
      ":status" -> "307", "cache-control" -> "private",
      "date" -> "Mon, 21 Oct 2013 20:13:21 GMT",
      "location" -> "https://www.example.com")))
    assert(d.dynamicTable.head == (":status" -> "307"))
    assert(d.dynamicSize == 222)
    // third response evicts two more; adds date/content-encoding/set-cookie
    assert(d.decode(hex(
      "88c1 6196 d07a be94 1054 d444 a820 0595 040b 8166 e084 a62d 1bff c05a" +
      "839b d9ab 77ad 94e7 821d d7f2 e6c7 b335 dfdf cd5b 3960 d5af 2708 7f36" +
      "72c1 ab27 0fb5 291f 9587 3160 65c0 03ed 4ee5 b106 3d50 07")).contains(Seq(
      ":status" -> "200", "cache-control" -> "private",
      "date" -> "Mon, 21 Oct 2013 20:13:22 GMT",
      "location" -> "https://www.example.com",
      "content-encoding" -> "gzip",
      "set-cookie" -> "foo=ASDJKHQKBZXOQWEOPIUAXQWEOIU; max-age=3600; version=1")))
    assert(d.dynamicSize == 215)
    assert(d.dynamicTable.map(_._1) == Seq("set-cookie", "content-encoding", "date"))
  }

  test("huffman round-trip and padding rules") {
    for (s <- Seq("www.example.com", "no-cache", "custom-value", "/reflexpb.Reflex/Stream",
        "application/grpc", "", "a", "Mon, 21 Oct 2013 20:13:22 GMT")) {
      val enc = Hpack.huffmanEncode(s)
      assert(Hpack.huffmanDecode(enc, 0, enc.length).contains(s), s"round-trip of '$s'")
    }
    // golden from C.4.1: 'www.example.com'
    assert(Hpack.huffmanEncode("www.example.com").toSeq ==
      hex("f1e3 c2e5 f23a 6ba0 ab90 f4ff").toSeq)
    // padding of zero bits is invalid (must be EOS prefix = all ones)
    val bad = Hpack.huffmanEncode("www.example.com")
    bad(bad.length - 1) = (bad(bad.length - 1) & 0xfe).toByte // clear a pad bit
    assert(Hpack.huffmanDecode(bad, 0, bad.length).isEmpty)
  }

  test("encoder output decodes on a fresh decoder (stateless subset)") {
    val headers = Seq(
      ":status" -> "200",
      "content-type" -> "application/grpc",
      "grpc-status" -> "0",
      ":path" -> "/reflexpb.Reflex/Stream")
    val d = new Hpack.Decoder()
    assert(d.decode(Hpack.encode(headers)).contains(headers))
    assert(d.dynamicTable.isEmpty) // encoder never touches the dynamic table
    // exact static match compresses to one byte
    assert(Hpack.encode(Seq(":status" -> "200")).toSeq == Seq(0x88.toByte))
    // C.2.2 golden: :path /sample/path as literal-without-indexing
    assert(Hpack.encode(Seq(":path" -> "/sample/path")).toSeq ==
      hex("040c 2f73 616d 706c 652f 7061 7468").toSeq)
  }
}
