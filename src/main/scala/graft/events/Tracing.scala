package graft.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Immutable OTel-style span context carried in `Event.trace`
  * (reference: internal/tracing/tracing.go Extract/Inject over
  * go.opentelemetry.io/otel/trace.SpanContext). Ids are lowercase hex
  * strings — 32 chars (16 bytes) for the trace id, 16 chars (8 bytes)
  * for the span id — per the W3C Trace Context / OTel conventions.
  */
final case class SpanContext(traceId: String, spanId: String, remote: Boolean = false) {

  /** reference tracing.go Extract validity: has a trace id AND a span
    * id (OTel HasTraceID/HasSpanID = correct-length, non-zero hex).
    */
  def isValid: Boolean =
    Tracing.validHexId(traceId, 32) && Tracing.validHexId(spanId, 16)

  /** W3C Trace Context `traceparent` header (version 00, sampled flag
    * set) — the cross-service interop format for the same ids.
    */
  def traceparent: String = s"00-$traceId-$spanId-01"
}

/** Span-context codec for `Event.trace`, wire-compatible with the
  * reference's storage blob (internal/tracing/encode.go:13,
  * decode.go:12): `reflexpb.Trace { string trace_id = 1;
  * string span_id = 2; }`, protobuf-encoded. A two-string-field
  * message needs no proto toolchain — its wire image is two
  * length-delimited fields (keys 0x0A and 0x12) per the public
  * protobuf encoding spec — so blobs written by the reference decode
  * here byte-for-byte and vice versa.
  *
  * Error handling mirrors the reference: `marshal` cannot fail;
  * `unmarshal` fails (None) on malformed proto bytes or on ids that
  * OTel's TraceIDFromHex/SpanIDFromHex would reject (wrong length,
  * non-lowercase-hex, all-zero); `inject` is best-effort — empty or
  * undecodable blobs leave the context unchanged (tracing.go:19).
  */
object Tracing {

  /** OTel hex-id validation: exact length, lowercase hex, not
    * all-zero (trace/trace.go decodeHex semantics).
    */
  def validHexId(s: String, n: Int): Boolean =
    s != null && s.length == n &&
      s.forall(c => (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')) &&
      s.exists(_ != '0')

  /** Encode a span context into the reference's storage blob.
    * Field order and framing match what the reference's proto
    * encoder emits for this message (trace_id then span_id, both
    * always present as fixed-width hex strings).
    */
  def marshal(sc: SpanContext): Array[Byte] =
    new graft.util.ProtoWire.Writer(56)
      .string(1, sc.traceId).string(2, sc.spanId).result()

  /** Decode a storage blob. None on malformed proto or invalid ids —
    * the caller treats that as "no trace" (best-effort semantics).
    * A conformant parser (graft.util.ProtoWire), not a fixed-offset
    * peek: varint lengths and unknown fields of any wire type are
    * handled, so re-encoded or extended blobs still decode.
    */
  def unmarshal(bytes: Array[Byte]): Option[SpanContext] = {
    if (bytes == null) return None
    val r = new graft.util.ProtoWire.Reader(bytes)
    var traceId = ""; var spanId = ""
    while (r.next()) r.field match {
      case 1 if r.wireType == 2 => traceId = r.readString()
      case 2 if r.wireType == 2 => spanId = r.readString()
      case _ => r.skip()
    }
    if (!r.valid) return None
    val sc = SpanContext(traceId, spanId, remote = true)
    if (sc.isValid) Some(sc) else None
  }

  /** Per-event best-effort injection (consumer.go:167 → tracing.go
    * Inject): the decoded remote span context if the event carries a
    * valid trace blob, None otherwise — never an error.
    */
  def inject(e: Event): Option[SpanContext] =
    if (e.trace == null || e.trace.isEmpty) None else unmarshal(e.trace)

  /** Parse a W3C `traceparent` header back into a span context. */
  def fromTraceparent(s: String): Option[SpanContext] = s match {
    case null => None
    case Tracing.TraceparentRe(t, p) =>
      val sc = SpanContext(t, p, remote = true)
      if (sc.isValid) Some(sc) else None
    case _ => None
  }
  private val TraceparentRe = "^[0-9a-f]{2}-([0-9a-f]{32})-([0-9a-f]{16})-[0-9a-f]{2}$".r

  /** Declarative column decode: trace_id / span_id string columns from
    * the blob, entirely in builtin (codegen'd) functions — no UDF, no
    * per-row JVM call. Decodes the CANONICAL frame the reference's
    * encoder (and `marshal`) always emits — `0A 20 <32 ascii> 12 10
    * <16 ascii>`, checked by prefix — and yields null for anything
    * else (including absent traces); non-canonical-but-valid proto is
    * a JVM-side `unmarshal` concern, not a corpus-scan one.
    */
  // canonical-frame prefix check + the same id validation the JVM
  // codec applies (lowercase hex, not all-zero) so the two decoders
  // agree row-for-row; BOTH ids must be valid or neither decodes
  // (unmarshal is all-or-nothing too)
  private def canonical(trace: Column): Column =
    length(trace) === 52 && hex(substring(trace, 1, 2)) === "0A20" &&
      hex(substring(trace, 35, 2)) === "1210" &&
      substring(trace, 3, 32).cast("string").rlike("^[0-9a-f]{32}$") &&
      substring(trace, 3, 32).cast("string") =!= "0" * 32 &&
      substring(trace, 37, 16).cast("string").rlike("^[0-9a-f]{16}$") &&
      substring(trace, 37, 16).cast("string") =!= "0" * 16

  def traceIdCol(trace: Column): Column =
    when(canonical(trace), substring(trace, 3, 32).cast("string"))

  def spanIdCol(trace: Column): Column =
    when(canonical(trace), substring(trace, 37, 16).cast("string"))

  /** Event frame with trace_id / span_id decoded alongside — the
    * batch-engine analog of per-event Inject: a consumer (or an
    * audit query) groups / joins / logs by trace id declaratively.
    */
  def withTraceIds(df: DataFrame): DataFrame =
    df.withColumn("trace_id", traceIdCol(col("trace")))
      .withColumn("span_id", spanIdCol(col("trace")))
}
