package graft.util

/** Minimal protobuf wire-format reader/writer (the public encoding
  * spec: varints, 64/32-bit fixed, length-delimited). Enough to frame
  * the reference's four-message `reflexpb` schema byte-compatibly
  * without a proto toolchain; NOT a general proto library — no
  * groups, no packed repeated fields.
  */
object ProtoWire {

  /** Growable little write buffer. */
  final class Writer(initial: Int = 64) {
    private var buf = new Array[Byte](initial)
    private var n = 0
    private def ensure(k: Int): Unit =
      if (n + k > buf.length) {
        buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, n + k))
      }
    def varint(v0: Long): this.type = {
      var v = v0; ensure(10)
      while ((v & ~0x7fL) != 0) { buf(n) = ((v & 0x7f) | 0x80).toByte; n += 1; v >>>= 7 }
      buf(n) = v.toByte; n += 1; this
    }
    def tag(field: Int, wireType: Int): this.type = varint((field.toLong << 3) | wireType)
    /** length-delimited bytes field. */
    def bytes(field: Int, b: Array[Byte]): this.type = {
      tag(field, 2).varint(b.length.toLong); ensure(b.length)
      System.arraycopy(b, 0, buf, n, b.length); n += b.length; this
    }
    def string(field: Int, s: String): this.type =
      bytes(field, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    /** varint scalar field (int32/int64/bool). */
    def int(field: Int, v: Long): this.type = tag(field, 0).varint(v)
    def bool(field: Int, v: Boolean): this.type = int(field, if (v) 1L else 0L)
    /** 64-bit fixed field (double). */
    def double(field: Int, v: Double): this.type = {
      tag(field, 1); ensure(8)
      var bits = java.lang.Double.doubleToLongBits(v); var i = 0
      while (i < 8) { buf(n) = bits.toByte; bits >>>= 8; n += 1; i += 1 }
      this
    }
    /** nested message field. */
    def message(field: Int, m: Writer): this.type = bytes(field, m.result())
    def result(): Array[Byte] = java.util.Arrays.copyOf(buf, n)
  }

  /** Cursor-based reader over one message's bytes. Field iteration:
    * `while (r.next()) r.field match { ... case _ => r.skip() }`.
    * Malformed input surfaces as `valid == false`, never an exception.
    */
  final class Reader(bytes: Array[Byte], from: Int, until: Int) {
    def this(bytes: Array[Byte]) = this(bytes, 0, bytes.length)
    private var i = from
    private var fieldNo = 0
    private var wire = 0
    var valid = true
    def field: Int = fieldNo
    def wireType: Int = wire

    private def varintRaw(): Long = {
      var shift = 0; var v = 0L
      while (i < until && shift < 64) {
        val b = bytes(i); i += 1
        v |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
      }
      valid = false; -1L
    }

    /** Advance to the next field key; false at end-of-message. */
    def next(): Boolean = {
      if (!valid || i >= until) return false
      val key = varintRaw()
      if (!valid || key < 0) { valid = false; return false }
      fieldNo = (key >> 3).toInt; wire = (key & 7).toInt
      fieldNo > 0
    }
    def readVarint(): Long = varintRaw()
    def readDouble(): Double = {
      if (i + 8 > until) { valid = false; return 0.0 }
      var bits = 0L; var k = 7
      while (k >= 0) { bits = (bits << 8) | (bytes(i + k) & 0xffL); k -= 1 }
      i += 8
      java.lang.Double.longBitsToDouble(bits)
    }
    /** length-delimited payload: returns (offset, length) into the
      * underlying array, or null slice on malformed input.
      */
    def readSlice(): (Int, Int) = {
      val len = varintRaw()
      if (!valid || len < 0 || i + len > until) { valid = false; return (0, -1) }
      val off = i; i += len.toInt; (off, len.toInt)
    }
    def readBytes(): Array[Byte] = {
      val (off, len) = readSlice()
      if (len < 0) Array.emptyByteArray
      else java.util.Arrays.copyOfRange(bytes, off, off + len)
    }
    def readString(): String = {
      val (off, len) = readSlice()
      if (len < 0) "" else new String(bytes, off, len, java.nio.charset.StandardCharsets.UTF_8)
    }
    /** Sub-reader over a nested message field. */
    def readMessage(): Reader = {
      val (off, len) = readSlice()
      val r = new Reader(bytes, off, if (len < 0) off else off + len)
      if (len < 0) r.valid = false
      r
    }
    /** Skip the current field's payload, any wire type. */
    def skip(): Unit = wire match {
      case 0 => readVarint(); ()
      case 1 => if (i + 8 > until) valid = false else i += 8
      case 2 => readSlice(); ()
      case 5 => if (i + 4 > until) valid = false else i += 4
      case _ => valid = false // groups / reserved
    }
  }

  /** Delimited-stream framing (the standard writeDelimitedTo shape):
    * varint byte-length prefix, then the message bytes.
    */
  def writeDelimited(out: java.io.OutputStream, msg: Array[Byte]): Unit = {
    var v = msg.length.toLong
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
    out.write(msg)
  }

  /** Read one delimited message; None on clean EOF, malformed prefix,
    * or oversize frame (maxLen guards a garbage length byte from
    * allocating gigabytes).
    */
  def readDelimited(in: java.io.InputStream, maxLen: Int = 1 << 26): Option[Array[Byte]] = {
    var shift = 0; var len = 0L
    var b = in.read()
    if (b < 0) return None // clean EOF before a frame
    while (b >= 0 && shift < 35) {
      len |= (b & 0x7fL) << shift
      if ((b & 0x80) == 0) {
        if (len > maxLen) return None
        val buf = new Array[Byte](len.toInt)
        var off = 0
        while (off < len) {
          val k = in.read(buf, off, len.toInt - off)
          if (k < 0) return None // truncated frame
          off += k
        }
        return Some(buf)
      }
      shift += 7
      b = in.read()
    }
    None
  }
}
