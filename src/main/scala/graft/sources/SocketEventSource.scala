package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Networked event feed (reference: server.go/client.go — reflex's
  * headline cross-service streaming, where a client consumes another
  * service's event log over gRPC with its own cursor).
  *
  * Spark-first mapping: the transport is a Structured Streaming
  * source; the wire format is one JSON event per line (the reference's
  * protobuf Event ↔ protocp.go, re-expressed as JSON for a
  * dependency-free container). The consumer side is transport-blind:
  * the parsed stream feeds `Runner.runStreamFrom`, which applies the
  * SAME cursor protocol as the file-log consumer — at-least-once with
  * cursor pruning on a fresh checkpoint. With a broker (Kafka) in the
  * environment, swap `format("socket")` for `format("kafka")` and the
  * value parsing and everything downstream is unchanged.
  */
object SocketEventSource {

  /** Wire schema: the canonical event as a JSON object per line.
    * `ts` is epoch milliseconds (longs survive every JSON codec;
    * ISO strings invite timezone drift).
    */
  val wireSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("eventType", StringType),
    StructField("foreignId", LongType),
    StructField("ts_ms", LongType),
    StructField("value", DoubleType),
    StructField("metadata", StringType)))

  /** Streaming DataFrame of canonical events from a line-oriented
    * socket feed. Malformed lines drop (from_json yields null id).
    * The transport is the stock socket source; the format is the
    * WireFraming.LineJson seam — a broker source swaps the first
    * two lines, the framing, and everything downstream survives.
    */
  def stream(spark: SparkSession, host: String, port: Int): DataFrame =
    WireFraming.LineJson.decode(
      spark.readStream
        .format("socket")
        .option("host", host)
        .option("port", port)
        .load())

  /** Serialize one event to the wire format (producer side). */
  def toWire(id: Long, eventType: String, foreignId: Long, tsMs: Long,
      value: Double, metadata: String): String = {
    val meta = graft.Verify.jsonQuote(metadata)
    val et = graft.Verify.jsonQuote(eventType)
    s"""{"id":$id,"eventType":$et,"foreignId":$foreignId,"ts_ms":$tsMs,"value":$value,"metadata":$meta}"""
  }

  /** Null-tolerant serialization from a collected row shaped
    * (id, eventType, foreignId, ts_ms, value, metadata): every field
    * but id is nullable in the canonical schema and emits JSON null,
    * which from_json round-trips back to a null column value.
    */
  def toWire(r: org.apache.spark.sql.Row): String = {
    def s(i: Int) = if (r.isNullAt(i)) "null" else graft.Verify.jsonQuote(r.getString(i))
    def l(i: Int) = if (r.isNullAt(i)) "null" else r.getLong(i).toString
    def d(i: Int) = if (r.isNullAt(i)) "null" else r.getDouble(i).toString
    s"""{"id":${r.getLong(0)},"eventType":${s(1)},"foreignId":${l(2)},"ts_ms":${l(3)},"value":${d(4)},"metadata":${s(5)}}"""
  }
}
