package graft.util

import org.scalatest.funsuite.AnyFunSuite

/** Seeded randomized HPACK checks on top of HpackSpec's RFC goldens:
  * Huffman round-trips over arbitrary byte strings, encoder→decoder
  * round-trips for random header lists, and an independent
  * mini-encoder that randomly mixes indexed / incremental-indexing /
  * Huffman representations while tracking its own dynamic table by
  * the RFC 7541 §4.1 size rule — the decoder must reproduce the
  * original header list from every block sequence.
  */
class HpackPropSpec extends AnyFunSuite {

  test("huffman round-trips arbitrary byte strings (all 256 symbols)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val n = rnd.nextInt(40)
      val s = new String(Array.fill(n)(rnd.nextInt(256).toChar))
      val enc = Hpack.huffmanEncode(s)
      assert(Hpack.huffmanDecode(enc, 0, enc.length).contains(s))
    }
  }

  test("stateless encoder round-trips random header lists") {
    val rnd = new scala.util.Random(13)
    val names = Array(":path", ":status", "content-type", "grpc-status",
      "x-custom", "te", "grpc-message", "authority-ish")
    for (_ <- 1 to 100) {
      val hs = (0 until rnd.nextInt(8)).map { _ =>
        val v = new String(Array.fill(rnd.nextInt(30))((32 + rnd.nextInt(95)).toChar))
        names(rnd.nextInt(names.length)) -> v
      }
      assert(new Hpack.Decoder().decode(Hpack.encode(hs)).contains(hs))
    }
  }

  test("randomized stateful encodings (indexed/incremental/huffman) decode correctly") {
    val rnd = new scala.util.Random(29)
    val maxSize = 4096
    val decoder = new Hpack.Decoder(maxSize)
    // independent reference dynamic table: most-recent-first,
    // size = name.len + value.len + 32, evict from the back
    var dyn = Vector.empty[(String, String)]
    def dynSize(t: Vector[(String, String)]): Int =
      t.map { case (n, v) => n.length + v.length + 32 }.sum
    val names = Array("a-header", "b-header", "content-type", "x-trace")
    for (round <- 1 to 50) {
      val out = new java.io.ByteArrayOutputStream()
      val expected = Seq.newBuilder[(String, String)]
      for (_ <- 0 until (1 + rnd.nextInt(6))) {
        val reuse = dyn.nonEmpty && rnd.nextBoolean()
        if (reuse) { // indexed reference into the dynamic table
          val i = rnd.nextInt(dyn.length)
          Hpack.writeInt(out, 0x80, 7, Hpack.staticTable.length + 1 + i)
          expected += dyn(i)
        } else { // literal with incremental indexing, maybe huffman
          val nv = (names(rnd.nextInt(names.length)),
            new String(Array.fill(rnd.nextInt(20))((97 + rnd.nextInt(26)).toChar)))
          out.write(0x40)
          for (s <- Seq(nv._1, nv._2)) {
            if (rnd.nextBoolean()) {
              val h = Hpack.huffmanEncode(s)
              Hpack.writeInt(out, 0x80, 7, h.length)
              out.write(h)
            } else {
              val b = s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
              Hpack.writeInt(out, 0x00, 7, b.length)
              out.write(b)
            }
          }
          dyn = (nv +: dyn)
          while (dynSize(dyn) > maxSize) dyn = dyn.dropRight(1)
          expected += nv
        }
      }
      val got = decoder.decode(out.toByteArray)
      assert(got.contains(expected.result()), s"round $round")
      assert(decoder.dynamicTable == dyn, s"dynamic table after round $round")
    }
  }
}
