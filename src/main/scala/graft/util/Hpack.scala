package graft.util

import java.nio.charset.StandardCharsets.ISO_8859_1
import scala.collection.mutable.ArrayBuffer

/** HPACK header compression (RFC 7541) — the header-block codec HTTP/2
  * requires, built for [[Http2]]/[[graft.sources.GrpcEventServer]] so a
  * stock gRPC peer's HEADERS frames decode with the real algorithm:
  * static + dynamic table indexing, incremental indexing, dynamic-table
  * size updates with eviction, and canonical Huffman string decoding.
  *
  * The Huffman code (RFC 7541 Appendix B) and static table (Appendix A)
  * are the RFC's published constants; the decoder is validated against
  * the RFC's own Appendix C worked examples (HpackSpec) so conformance
  * is checked against cross-implementation golden bytes, not against
  * this file's own encoder.
  *
  * The encoder side is deliberately stateless: exact/name matches use
  * the static table, everything else is emitted as literal WITHOUT
  * incremental indexing and without Huffman. That subset is always
  * legal for any receiver (no dynamic-table synchronization to get
  * wrong) and keeps response header overhead irrelevant next to DATA
  * frames, which is where an event stream's bytes live.
  *
  * Reference counterpart: the reference serves reflexpb over gRPC
  * (server.go:1, client.go:1); gRPC's transport is HTTP/2, whose
  * header layer is exactly this codec.
  */
object Hpack {

  /** RFC 7541 Appendix A — the 61-entry static table. */
  val staticTable: IndexedSeq[(String, String)] = IndexedSeq(
    ":authority" -> "",
    ":method" -> "GET",
    ":method" -> "POST",
    ":path" -> "/",
    ":path" -> "/index.html",
    ":scheme" -> "http",
    ":scheme" -> "https",
    ":status" -> "200",
    ":status" -> "204",
    ":status" -> "206",
    ":status" -> "304",
    ":status" -> "400",
    ":status" -> "404",
    ":status" -> "500",
    "accept-charset" -> "",
    "accept-encoding" -> "gzip, deflate",
    "accept-language" -> "",
    "accept-ranges" -> "",
    "accept" -> "",
    "access-control-allow-origin" -> "",
    "age" -> "",
    "allow" -> "",
    "authorization" -> "",
    "cache-control" -> "",
    "content-disposition" -> "",
    "content-encoding" -> "",
    "content-language" -> "",
    "content-length" -> "",
    "content-location" -> "",
    "content-range" -> "",
    "content-type" -> "",
    "cookie" -> "",
    "date" -> "",
    "etag" -> "",
    "expect" -> "",
    "expires" -> "",
    "from" -> "",
    "host" -> "",
    "if-match" -> "",
    "if-modified-since" -> "",
    "if-none-match" -> "",
    "if-range" -> "",
    "if-unmodified-since" -> "",
    "last-modified" -> "",
    "link" -> "",
    "location" -> "",
    "max-forwards" -> "",
    "proxy-authenticate" -> "",
    "proxy-authorization" -> "",
    "range" -> "",
    "referer" -> "",
    "refresh" -> "",
    "retry-after" -> "",
    "server" -> "",
    "set-cookie" -> "",
    "strict-transport-security" -> "",
    "transfer-encoding" -> "",
    "user-agent" -> "",
    "vary" -> "",
    "via" -> "",
    "www-authenticate" -> "")

  // RFC 7541 Appendix B: canonical Huffman code for header strings —
  // huffCodes(sym) is the code, huffLens(sym) its bit length; index
  // 256 is EOS (only ever a padding prefix on the wire).
  private val huffCodes: Array[Int] = Array(
    0x1ff8, 0x7fffd8, 0xfffffe2, 0xfffffe3, 0xfffffe4, 0xfffffe5, 0xfffffe6, 0xfffffe7, 0xfffffe8, 0xffffea, 
    0x3ffffffc, 0xfffffe9, 0xfffffea, 0x3ffffffd, 0xfffffeb, 0xfffffec, 0xfffffed, 0xfffffee, 0xfffffef, 0xffffff0, 
    0xffffff1, 0xffffff2, 0x3ffffffe, 0xffffff3, 0xffffff4, 0xffffff5, 0xffffff6, 0xffffff7, 0xffffff8, 0xffffff9, 
    0xffffffa, 0xffffffb, 0x14, 0x3f8, 0x3f9, 0xffa, 0x1ff9, 0x15, 0xf8, 0x7fa, 
    0x3fa, 0x3fb, 0xf9, 0x7fb, 0xfa, 0x16, 0x17, 0x18, 0x0, 0x1, 
    0x2, 0x19, 0x1a, 0x1b, 0x1c, 0x1d, 0x1e, 0x1f, 0x5c, 0xfb, 
    0x7ffc, 0x20, 0xffb, 0x3fc, 0x1ffa, 0x21, 0x5d, 0x5e, 0x5f, 0x60, 
    0x61, 0x62, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 
    0x6b, 0x6c, 0x6d, 0x6e, 0x6f, 0x70, 0x71, 0x72, 0xfc, 0x73, 
    0xfd, 0x1ffb, 0x7fff0, 0x1ffc, 0x3ffc, 0x22, 0x7ffd, 0x3, 0x23, 0x4, 
    0x24, 0x5, 0x25, 0x26, 0x27, 0x6, 0x74, 0x75, 0x28, 0x29, 
    0x2a, 0x7, 0x2b, 0x76, 0x2c, 0x8, 0x9, 0x2d, 0x77, 0x78, 
    0x79, 0x7a, 0x7b, 0x7ffe, 0x7fc, 0x3ffd, 0x1ffd, 0xffffffc, 0xfffe6, 0x3fffd2, 
    0xfffe7, 0xfffe8, 0x3fffd3, 0x3fffd4, 0x3fffd5, 0x7fffd9, 0x3fffd6, 0x7fffda, 0x7fffdb, 0x7fffdc, 
    0x7fffdd, 0x7fffde, 0xffffeb, 0x7fffdf, 0xffffec, 0xffffed, 0x3fffd7, 0x7fffe0, 0xffffee, 0x7fffe1, 
    0x7fffe2, 0x7fffe3, 0x7fffe4, 0x1fffdc, 0x3fffd8, 0x7fffe5, 0x3fffd9, 0x7fffe6, 0x7fffe7, 0xffffef, 
    0x3fffda, 0x1fffdd, 0xfffe9, 0x3fffdb, 0x3fffdc, 0x7fffe8, 0x7fffe9, 0x1fffde, 0x7fffea, 0x3fffdd, 
    0x3fffde, 0xfffff0, 0x1fffdf, 0x3fffdf, 0x7fffeb, 0x7fffec, 0x1fffe0, 0x1fffe1, 0x3fffe0, 0x1fffe2, 
    0x7fffed, 0x3fffe1, 0x7fffee, 0x7fffef, 0xfffea, 0x3fffe2, 0x3fffe3, 0x3fffe4, 0x7ffff0, 0x3fffe5, 
    0x3fffe6, 0x7ffff1, 0x3ffffe0, 0x3ffffe1, 0xfffeb, 0x7fff1, 0x3fffe7, 0x7ffff2, 0x3fffe8, 0x1ffffec, 
    0x3ffffe2, 0x3ffffe3, 0x3ffffe4, 0x7ffffde, 0x7ffffdf, 0x3ffffe5, 0xfffff1, 0x1ffffed, 0x7fff2, 0x1fffe3, 
    0x3ffffe6, 0x7ffffe0, 0x7ffffe1, 0x3ffffe7, 0x7ffffe2, 0xfffff2, 0x1fffe4, 0x1fffe5, 0x3ffffe8, 0x3ffffe9, 
    0xffffffd, 0x7ffffe3, 0x7ffffe4, 0x7ffffe5, 0xfffec, 0xfffff3, 0xfffed, 0x1fffe6, 0x3fffe9, 0x1fffe7, 
    0x1fffe8, 0x7ffff3, 0x3fffea, 0x3fffeb, 0x1ffffee, 0x1ffffef, 0xfffff4, 0xfffff5, 0x3ffffea, 0x7ffff4, 
    0x3ffffeb, 0x7ffffe6, 0x3ffffec, 0x3ffffed, 0x7ffffe7, 0x7ffffe8, 0x7ffffe9, 0x7ffffea, 0x7ffffeb, 0xffffffe, 
    0x7ffffec, 0x7ffffed, 0x7ffffee, 0x7ffffef, 0x7fffff0, 0x3ffffee, 0x3fffffff)

  private val huffLens: Array[Int] = Array(
    13, 23, 28, 28, 28, 28, 28, 28, 28, 24, 30, 28, 28, 30, 28, 28, 28, 28, 28, 28, 
    28, 28, 30, 28, 28, 28, 28, 28, 28, 28, 28, 28, 6, 10, 10, 12, 13, 6, 8, 11, 
    10, 10, 8, 11, 8, 6, 6, 6, 5, 5, 5, 6, 6, 6, 6, 6, 6, 6, 7, 8, 
    15, 6, 12, 10, 13, 6, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 
    7, 7, 7, 7, 7, 7, 7, 7, 8, 7, 8, 13, 19, 13, 14, 6, 15, 5, 6, 5, 
    6, 5, 6, 6, 6, 5, 7, 7, 6, 6, 6, 5, 6, 7, 6, 5, 5, 6, 7, 7, 
    7, 7, 7, 15, 11, 14, 13, 28, 20, 22, 20, 20, 22, 22, 22, 23, 22, 23, 23, 23, 
    23, 23, 24, 23, 24, 24, 22, 23, 24, 23, 23, 23, 23, 21, 22, 23, 22, 23, 23, 24, 
    22, 21, 20, 22, 22, 23, 23, 21, 23, 22, 22, 24, 21, 22, 23, 23, 21, 21, 22, 21, 
    23, 22, 23, 23, 20, 22, 22, 22, 23, 22, 22, 23, 26, 26, 20, 19, 22, 23, 22, 25, 
    26, 26, 26, 27, 27, 26, 24, 25, 19, 21, 26, 27, 27, 26, 27, 24, 21, 21, 26, 26, 
    28, 27, 27, 27, 20, 24, 20, 21, 22, 21, 21, 23, 22, 22, 25, 25, 24, 24, 26, 23, 
    26, 27, 26, 26, 27, 27, 27, 27, 27, 28, 27, 27, 27, 27, 27, 26, 30)

  // Huffman decode walks a binary trie built once from the code table.
  // Node layout: trie(n)(bit) = child node id, or -(sym+1) for a leaf.
  private val trie: Array[Array[Int]] = {
    val nodes = ArrayBuffer(Array(0, 0)) // node 0 = root; 0 = unset
    for (sym <- 0 until 257) {
      val code = huffCodes(sym)
      val len = huffLens(sym)
      var n = 0
      var i = len - 1
      while (i >= 0) {
        val bit = (code >>> i) & 1
        if (i == 0) nodes(n)(bit) = -(sym + 1)
        else {
          if (nodes(n)(bit) == 0) { nodes += Array(0, 0); nodes(n)(bit) = nodes.length - 1 }
          n = nodes(n)(bit)
        }
        i -= 1
      }
    }
    nodes.toArray
  }

  /** Decode a Huffman-coded string literal. Returns None on a code
    * that isn't a symbol (incl. an explicit EOS, which RFC 7541 §5.2
    * says MUST be treated as a decoding error) or on padding longer
    * than 7 bits / not matching the EOS prefix (all ones).
    */
  def huffmanDecode(bytes: Array[Byte], off: Int, len: Int): Option[String] = {
    val sb = new java.lang.StringBuilder(len * 2)
    var n = 0
    var depth = 0 // bits consumed since the last emitted symbol
    var onesRun = true // current partial path is all 1-bits (valid padding)
    var i = off
    val end = off + len
    while (i < end) {
      val b = bytes(i) & 0xff
      var k = 7
      while (k >= 0) {
        val bit = (b >>> k) & 1
        val nxt = trie(n)(bit)
        if (bit == 0) onesRun = false
        if (nxt < 0) {
          val sym = -nxt - 1
          if (sym == 256) return None // explicit EOS in the body
          sb.append(sym.toChar)
          n = 0; depth = 0; onesRun = true
        } else if (nxt == 0) {
          return None // dead branch: not a prefix of any code
        } else {
          n = nxt; depth += 1
        }
        k -= 1
      }
      i += 1
    }
    if (depth > 7 || !onesRun) None else Some(sb.toString)
  }

  /** Huffman-encode a string (ISO-8859-1 bytes → RFC 7541 App. B
    * code). Used by tests and available to peers that want the
    * compact form; the server's own encoder stays raw-literal.
    */
  def huffmanEncode(s: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(s.length)
    var acc = 0L
    var nbits = 0
    for (ch <- s) {
      val sym = ch.toInt & 0xff
      acc = (acc << huffLens(sym)) | (huffCodes(sym).toLong & 0xffffffffL)
      nbits += huffLens(sym)
      while (nbits >= 8) {
        nbits -= 8
        out.write(((acc >>> nbits) & 0xff).toInt)
      }
    }
    if (nbits > 0) { // pad with EOS-prefix ones
      val pad = 8 - nbits
      out.write((((acc << pad) | ((1 << pad) - 1)) & 0xff).toInt)
    }
    out.toByteArray
  }

  /** HPACK primitive integer (RFC 7541 §5.1): `value` under an N-bit
    * prefix, `first` carries the pattern bits above the prefix.
    */
  def writeInt(out: java.io.ByteArrayOutputStream, first: Int, prefixBits: Int, value: Int): Unit = {
    val max = (1 << prefixBits) - 1
    if (value < max) out.write(first | value)
    else {
      out.write(first | max)
      var v = value - max
      while (v >= 128) { out.write((v & 0x7f) | 0x80); v >>>= 7 }
      out.write(v)
    }
  }

  /** Decoder with connection-scoped dynamic table. Not thread-safe —
    * HTTP/2 header blocks on one connection are strictly sequential
    * (CONTINUATION rules), which is the only context this runs in.
    *
    * @param maxDynamicSize the SETTINGS_HEADER_TABLE_SIZE this side
    *   advertised (the ceiling a size update may set; RFC 7541 §4.2)
    */
  final class Decoder(val maxDynamicSize: Int = 4096) {
    // most-recent-first; "size" per RFC 7541 §4.1: name + value + 32
    private val dyn = ArrayBuffer.empty[(String, String)]
    private var dynSize = 0
    private var dynCapacity = maxDynamicSize

    def dynamicTable: Seq[(String, String)] = dyn.toSeq
    def dynamicSize: Int = dynSize

    private def entrySize(nv: (String, String)): Int = nv._1.length + nv._2.length + 32

    private def evictTo(cap: Int): Unit =
      while (dynSize > cap && dyn.nonEmpty) {
        dynSize -= entrySize(dyn.remove(dyn.length - 1))
      }

    private def add(nv: (String, String)): Unit = {
      val sz = entrySize(nv)
      evictTo(dynCapacity - sz)
      if (sz <= dynCapacity) { dyn.insert(0, nv); dynSize += sz }
      // an entry larger than the table empties it (RFC 7541 §4.4)
    }

    private def lookup(index: Int): Option[(String, String)] =
      if (index >= 1 && index <= staticTable.length) Some(staticTable(index - 1))
      else {
        val d = index - staticTable.length - 1
        if (d >= 0 && d < dyn.length) Some(dyn(d)) else None
      }

    /** Decode one complete header block. None = connection-fatal
      * compression error (RFC 7540 §4.3: COMPRESSION_ERROR).
      */
    def decode(block: Array[Byte]): Option[Seq[(String, String)]] = {
      val out = ArrayBuffer.empty[(String, String)]
      var i = 0

      def readInt(prefixBits: Int): Option[Int] = {
        if (i >= block.length) return None
        val max = (1 << prefixBits) - 1
        var v = block(i) & max
        i += 1
        if (v < max) return Some(v)
        var shift = 0
        var more = true
        while (more) {
          if (i >= block.length || shift > 28) return None
          val b = block(i) & 0xff
          i += 1
          v += (b & 0x7f) << shift
          shift += 7
          more = (b & 0x80) != 0
        }
        Some(v)
      }

      def readString(): Option[String] = {
        if (i >= block.length) return None
        val huff = (block(i) & 0x80) != 0
        readInt(7).flatMap { len =>
          if (i + len > block.length) None
          else {
            val s =
              if (huff) huffmanDecode(block, i, len)
              else Some(new String(block, i, len, ISO_8859_1))
            i += len
            s
          }
        }
      }

      def headerAt(index: => Option[Int]): Option[(String, String)] =
        index.flatMap { idx =>
          val name =
            if (idx == 0) readString()
            else lookup(idx).map(_._1)
          for (n <- name; v <- readString()) yield (n, v)
        }

      while (i < block.length) {
        val b = block(i) & 0xff
        if ((b & 0x80) != 0) { // indexed header field
          readInt(7) match {
            case Some(idx) if idx > 0 =>
              lookup(idx) match {
                case Some(nv) => out += nv
                case None => return None
              }
            case _ => return None // index 0 is a decoding error
          }
        } else if ((b & 0xc0) == 0x40) { // literal, incremental indexing
          headerAt(readInt(6)) match {
            case Some(nv) => add(nv); out += nv
            case None => return None
          }
        } else if ((b & 0xe0) == 0x20) { // dynamic table size update
          readInt(5) match {
            case Some(cap) if cap <= maxDynamicSize =>
              dynCapacity = cap
              evictTo(dynCapacity)
            case _ => return None
          }
        } else { // 0000/0001: literal without indexing / never indexed
          headerAt(readInt(4)) match {
            case Some(nv) => out += nv
            case None => return None
          }
        }
      }
      Some(out.toSeq)
    }
  }

  /** Stateless encoder (see object Scaladoc): static-table indexing
    * plus raw literals; never touches the peer's dynamic table.
    */
  def encode(headers: Seq[(String, String)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(64)
    def writeRaw(s: String): Unit = {
      val b = s.getBytes(ISO_8859_1)
      writeInt(out, 0x00, 7, b.length) // H bit clear: raw
      out.write(b, 0, b.length)
    }
    headers.foreach { case (name, value) =>
      val exact = staticTable.indexOf((name, value))
      if (exact >= 0) writeInt(out, 0x80, 7, exact + 1)
      else {
        val nameIdx = staticTable.indexWhere(_._1 == name)
        if (nameIdx >= 0) { // literal w/o indexing, indexed name
          writeInt(out, 0x00, 4, nameIdx + 1)
          writeRaw(value)
        } else { // literal w/o indexing, literal name
          out.write(0x00)
          writeRaw(name)
          writeRaw(value)
        }
      }
    }
    out.toByteArray
  }
}
