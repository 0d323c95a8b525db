package graft.util

import java.io.{InputStream, OutputStream}

/** HTTP/2 framing (RFC 7540) — the binary transport gRPC runs on,
  * implemented directly over sockets for
  * [[graft.sources.GrpcEventServer]]/Client: 9-octet frame headers,
  * SETTINGS, PING, WINDOW_UPDATE, RST_STREAM, GOAWAY, and the
  * HEADERS/CONTINUATION padding/priority envelope. Cleartext h2c with
  * prior knowledge (RFC 7540 §3.4) — exactly what `grpc.Dial` uses
  * against an insecure address.
  *
  * Only the layout lives here; connection behavior (handshake order,
  * flow-control accounting, stream states) lives with the endpoints.
  */
object Http2 {

  /** RFC 7540 §3.5 client connection preface. */
  val Preface: Array[Byte] =
    "PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)

  // frame types (RFC 7540 §6)
  val Data = 0x0
  val Headers = 0x1
  val Priority = 0x2
  val RstStream = 0x3
  val Settings = 0x4
  val PushPromise = 0x5
  val Ping = 0x6
  val GoAway = 0x7
  val WindowUpdate = 0x8
  val Continuation = 0x9

  // flags
  val FlagEndStream = 0x1 // DATA, HEADERS
  val FlagAck = 0x1 // SETTINGS, PING
  val FlagEndHeaders = 0x4 // HEADERS, CONTINUATION
  val FlagPadded = 0x8 // DATA, HEADERS
  val FlagPriority = 0x20 // HEADERS

  // SETTINGS identifiers (RFC 7540 §6.5.2)
  val SettingsHeaderTableSize = 0x1
  val SettingsEnablePush = 0x2
  val SettingsMaxConcurrentStreams = 0x3
  val SettingsInitialWindowSize = 0x4
  val SettingsMaxFrameSize = 0x5
  val SettingsMaxHeaderListSize = 0x6

  // error codes (RFC 7540 §7)
  val ErrNone = 0x0
  val ErrProtocol = 0x1
  val ErrFlowControl = 0x3
  val ErrFrameSize = 0x6
  val ErrCancel = 0x8
  val ErrCompression = 0x9

  val DefaultWindow = 65535
  val DefaultMaxFrame = 16384

  final case class Frame(tpe: Int, flags: Int, streamId: Int, payload: Array[Byte]) {
    def has(flag: Int): Boolean = (flags & flag) != 0
  }

  private def readFully(in: InputStream, n: Int): Option[Array[Byte]] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) return None
      off += r
    }
    Some(buf)
  }

  /** Read and verify the 24-octet client preface; false on EOF or a
    * non-HTTP/2 peer.
    */
  def readPreface(in: InputStream): Boolean =
    readFully(in, Preface.length).exists(java.util.Arrays.equals(_, Preface))

  /** Read one frame; None at clean EOF. `maxFrame` guards the 24-bit
    * length field against hostile/corrupt input (we advertise
    * SETTINGS_MAX_FRAME_SIZE, so a compliant peer never exceeds it).
    */
  def readFrame(in: InputStream, maxFrame: Int = DefaultMaxFrame): Option[Frame] =
    readFully(in, 9).flatMap { h =>
      val len = ((h(0) & 0xff) << 16) | ((h(1) & 0xff) << 8) | (h(2) & 0xff)
      if (len > maxFrame + 255) None // padded max-size frame is the ceiling
      else {
        val tpe = h(3) & 0xff
        val flags = h(4) & 0xff
        val sid = ((h(5) & 0x7f) << 24) | ((h(6) & 0xff) << 16) |
          ((h(7) & 0xff) << 8) | (h(8) & 0xff)
        readFully(in, len).map(Frame(tpe, flags, sid, _))
      }
    }

  /** Serialize one frame. Callers serialize access to `out` (HTTP/2
    * frames from concurrent streams must interleave at frame
    * granularity, never mid-frame).
    */
  def writeFrame(out: OutputStream, tpe: Int, flags: Int, streamId: Int,
      payload: Array[Byte] = Array.emptyByteArray): Unit = {
    val len = payload.length
    out.write(Array[Byte](
      ((len >>> 16) & 0xff).toByte, ((len >>> 8) & 0xff).toByte, (len & 0xff).toByte,
      tpe.toByte, flags.toByte,
      ((streamId >>> 24) & 0x7f).toByte, ((streamId >>> 16) & 0xff).toByte,
      ((streamId >>> 8) & 0xff).toByte, (streamId & 0xff).toByte))
    if (len > 0) out.write(payload)
  }

  def settingsPayload(settings: Seq[(Int, Long)]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(settings.size * 6)
    settings.foreach { case (id, v) => b.putShort(id.toShort).putInt(v.toInt) }
    b.array()
  }

  def parseSettings(payload: Array[Byte]): Map[Int, Long] = {
    val b = java.nio.ByteBuffer.wrap(payload)
    val out = Map.newBuilder[Int, Long]
    while (b.remaining() >= 6) out += ((b.getShort & 0xffff) -> (b.getInt & 0xffffffffL))
    out.result()
  }

  def windowUpdatePayload(increment: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(4).putInt(increment & 0x7fffffff).array()

  def parseWindowUpdate(payload: Array[Byte]): Int =
    if (payload.length < 4) 0
    else java.nio.ByteBuffer.wrap(payload).getInt & 0x7fffffff

  def rstPayload(errorCode: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(4).putInt(errorCode).array()

  def goAwayPayload(lastStreamId: Int, errorCode: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(8).putInt(lastStreamId & 0x7fffffff).putInt(errorCode).array()

  /** Strip the optional padding / priority envelope from a HEADERS (or
    * DATA) payload, returning the actual fragment (RFC 7540 §6.1/§6.2).
    */
  def unpad(f: Frame): Array[Byte] = {
    var start = 0
    var end = f.payload.length
    if (f.has(FlagPadded) && end > 0) {
      val pad = f.payload(0) & 0xff
      start += 1
      end = math.max(start, end - pad)
    }
    if (f.tpe == Headers && f.has(FlagPriority)) start = math.min(start + 5, end)
    java.util.Arrays.copyOfRange(f.payload, start, end)
  }
}
