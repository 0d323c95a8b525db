package graft.events

import graft.util.ProtoWire
import graft.util.ProtoWire.{Reader, Writer}

/** Wire codec for the reference's `reflexpb` stream schema
  * (reflexpb/reflex.proto:20-40), hand-framed per the public protobuf
  * encoding spec — blobs interoperate byte-for-byte with the
  * reference's generated code:
  *
  *   Event { reserved 1,2; int32 type = 3;
  *           google.protobuf.Timestamp timestamp = 4;
  *           string foreign_id = 5; string id = 6;
  *           bytes metadata = 7; bytes trace = 8; }
  *   StreamRequest { reserved 1; StreamOptions options = 2; string after = 3; }
  *   StreamOptions { google.protobuf.Duration lag = 1;
  *                   bool fromHead = 2; reserved 3; bool toHead = 4; }
  *
  * The reference's Event has no `value` field (its payloads live in
  * metadata); graft's event model carries one, so encode() writes it
  * as field 9 — unreserved, double — which proto3 decoders that don't
  * know it (the reference's) skip as an unknown field, and decode()
  * defaults to 0.0 when absent (reference-encoded events). Ids and
  * foreign ids are int64 here, strings on the wire (protocp.go passes
  * the reference's string ids straight through) — formatted/parsed at
  * the boundary, fail-soft to None on a non-numeric remote id.
  */
object ReflexPb {

  /** google.protobuf.Timestamp { int64 seconds = 1; int32 nanos = 2 } */
  private def timestampMsg(tsMs: Long): Writer = {
    val w = new Writer(16)
    val sec = Math.floorDiv(tsMs, 1000L)
    val nanos = Math.floorMod(tsMs, 1000L) * 1000000L
    if (sec != 0) w.int(1, sec)
    if (nanos != 0) w.int(2, nanos)
    w
  }

  /** Encode a graft event as a reflexpb.Event frame. `typeCode` maps
    * the stored string type to the reference's int contract
    * (EventType.code; unknown → -1 like EventType.codeColumn).
    */
  def encodeEvent(id: Long, eventType: String, foreignId: Long, tsMs: Long,
      value: Double, metadata: String, trace: Array[Byte] = null,
      `enum`: Seq[EventType] = EventType.Known.all): Array[Byte] = {
    val code = `enum`.find(_.name == eventType).map(_.code).getOrElse(-1)
    val w = new Writer(64)
    // proto3 emits non-default scalars only; field order = field number
    if (code != 0) w.int(3, code.toLong)
    val ts = timestampMsg(tsMs)
    w.message(4, ts)
    w.string(5, foreignId.toString)
    w.string(6, id.toString)
    if (metadata != null && metadata.nonEmpty)
      w.bytes(7, metadata.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    if (trace != null && trace.nonEmpty) w.bytes(8, trace)
    if (value != 0.0) w.double(9, value) // graft extension, see Scaladoc
    w.result()
  }

  final case class PbEvent(id: Long, eventType: String, foreignId: Long,
      tsMs: Long, value: Double, metadata: String, trace: Array[Byte])

  /** Decode a reflexpb.Event frame. None on malformed proto or on ids
    * that don't parse as int64 (the reference's ids are opaque
    * strings; graft's log keys are int64 — same boundary as
    * EventsTableStr). Unknown fields (incl. reserved 1/2) skip.
    */
  def decodeEvent(bytes: Array[Byte],
      `enum`: Seq[EventType] = EventType.Known.all): Option[PbEvent] = {
    val r = new Reader(bytes)
    var code = 0; var tsMs = 0L; var fid = ""; var id = ""
    var meta = ""; var trace: Array[Byte] = null; var value = 0.0
    while (r.next()) r.field match {
      case 3 => code = r.readVarint().toInt
      case 4 =>
        val t = r.readMessage()
        var sec = 0L; var nanos = 0L
        while (t.next()) t.field match {
          case 1 => sec = t.readVarint()
          case 2 => nanos = t.readVarint()
          case _ => t.skip()
        }
        if (!t.valid) r.valid = false
        tsMs = sec * 1000L + nanos / 1000000L
      case 5 => fid = r.readString()
      case 6 => id = r.readString()
      case 7 => meta = new String(r.readBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      case 8 => trace = r.readBytes()
      case 9 if r.wireType == 1 => value = r.readDouble()
      case _ => r.skip()
    }
    if (!r.valid) return None
    val name = `enum`.find(_.code == code).map(_.name).getOrElse(code.toString)
    for {
      idL <- id.toLongOption
      fidL <- fid.toLongOption
    } yield PbEvent(idL, name, fidL, tsMs, value, meta, trace)
  }

  /** StreamRequest{options, after}: after is the string cursor
    * (client.go sends the consumer's durable cursor).
    */
  def encodeStreamRequest(after: Long, toHead: Boolean = false,
      fromHead: Boolean = false, lagMs: Long = 0L): Array[Byte] = {
    val opts = new Writer(16)
    if (lagMs > 0) {
      val lag = new Writer(8)
      val sec = lagMs / 1000L
      val nanos = (lagMs % 1000L) * 1000000L
      if (sec != 0) lag.int(1, sec)
      if (nanos != 0) lag.int(2, nanos)
      opts.message(1, lag)
    }
    if (fromHead) opts.bool(2, true)
    if (toHead) opts.bool(4, true)
    val w = new Writer(32)
    val ob = opts.result()
    if (ob.nonEmpty) w.bytes(2, ob)
    w.string(3, after.toString)
    w.result()
  }

  final case class PbStreamRequest(after: Long, toHead: Boolean,
      fromHead: Boolean, lagMs: Long)

  def decodeStreamRequest(bytes: Array[Byte]): Option[PbStreamRequest] = {
    val r = new Reader(bytes)
    var after = "-1"; var toHead = false; var fromHead = false; var lagMs = 0L
    while (r.next()) r.field match {
      case 2 =>
        val o = r.readMessage()
        while (o.next()) o.field match {
          case 1 =>
            val d = o.readMessage()
            var sec = 0L; var nanos = 0L
            while (d.next()) d.field match {
              case 1 => sec = d.readVarint()
              case 2 => nanos = d.readVarint()
              case _ => d.skip()
            }
            if (!d.valid) r.valid = false
            lagMs = sec * 1000L + nanos / 1000000L
          case 2 => fromHead = o.readVarint() != 0
          case 4 => toHead = o.readVarint() != 0
          case _ => o.skip()
        }
        if (!o.valid) r.valid = false
      case 3 => after = r.readString()
      case _ => r.skip()
    }
    if (!r.valid) return None
    after.toLongOption.map(PbStreamRequest(_, toHead, fromHead, lagMs))
  }

  /** Frame an event onto a delimited stream (the server's Send). */
  def writeEventTo(out: java.io.OutputStream, ev: Array[Byte]): Unit =
    ProtoWire.writeDelimited(out, ev)

  /** Read the next event frame (the client's Recv); None at EOF. */
  def readEventFrom(in: java.io.InputStream,
      `enum`: Seq[EventType] = EventType.Known.all): Option[PbEvent] =
    ProtoWire.readDelimited(in).flatMap(decodeEvent(_, `enum`))
}
