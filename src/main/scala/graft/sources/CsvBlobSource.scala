package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CSV sibling of [[JsonBlobSource]] — a bucket of CSV blobs as an
  * ordered, cursor-resumable event stream (the reference's rblob
  * ships a JSON decoder, rblob/json.go, and documents the decoder as
  * the pluggable piece; this is that seam exercised with a second
  * wire format, the one most data lakes actually hold).
  *
  * Framing is RFC 4180: comma-separated fields, `"`-quoted fields
  * may contain commas, CRLF/LF newlines and `""`-escaped quotes —
  * so a RECORD is not a LINE, and Spark's line-oriented csv reader
  * cannot define stable in-blob offsets for multi-line records. Each
  * blob is read whole (one task per blob, like the concat-JSON
  * reader), split by the quote-aware scanner, and record ordinals
  * AFTER the header row become the in-blob offset. Cursors pack
  * exactly like the JSON source: `id = blob_ordinal << 40 | offset`,
  * ordinals in lexicographic key order, so `id > cursor` resumes
  * mid-blob; the reference string-cursor format (`key|NN|offset`)
  * round-trips through JsonBlobSource.cursorString/parseCursor
  * unchanged. Headers are per-blob: column order may differ across
  * blobs (schema drift between export epochs), values resolve by
  * NAME. `.csv.gz` decompresses through the Hadoop codec chain and
  * any FileSystem URI works — the same storage seam as the JSON
  * source.
  */
object CsvBlobSource {

  /** RFC 4180 splitter: whole blob → records → fields. Handles
    * quoted fields (embedded commas and newlines), `""` escapes,
    * CRLF and LF, and a final record without a trailing newline.
    */
  def splitCsv(content: String): IndexedSeq[IndexedSeq[String]] = {
    val records = IndexedSeq.newBuilder[IndexedSeq[String]]
    var fields = IndexedSeq.newBuilder[String]
    val field = new java.lang.StringBuilder()
    var inQuotes = false
    var sawAny = false // true once the current record has any content
    var i = 0
    def endField(): Unit = { fields += field.toString; field.setLength(0) }
    def endRecord(): Unit = {
      endField()
      records += fields.result()
      fields = IndexedSeq.newBuilder[String]
      sawAny = false
    }
    while (i < content.length) {
      val c = content.charAt(i)
      if (inQuotes) {
        if (c == '"') {
          if (i + 1 < content.length && content.charAt(i + 1) == '"') {
            field.append('"'); i += 1 // escaped quote
          } else inQuotes = false
        } else field.append(c)
        sawAny = true
      } else c match {
        case '"' => inQuotes = true; sawAny = true
        case ',' => endField(); sawAny = true
        case '\r' => () // swallowed; the \n ends the record
        case '\n' => if (sawAny) endRecord()
        case _ => field.append(c); sawAny = true
      }
      i += 1
    }
    if (sawAny) endRecord()
    records.result()
  }

  /** Batch view: every data record of every blob as
    * (blob_key, off, fields map, ragged) — off counts records after
    * the per-blob header, exactly what a `key|offset` cursor resumes
    * by. r13 ADVICE fix: a record whose field count differs from its
    * header is FLAGGED (`ragged = true`) instead of silently
    * truncated — missing trailing fields resolve to no map entry
    * (null downstream), extra fields are preserved under `_extra_N`
    * keys — so malformed blobs are routable to a dead-letter side
    * (the A15 discipline) rather than shifting record meaning.
    */
  def readRecords(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // per-bucket read counter (rblob/metrics.go read_total), same
    // executor-side accumulator discipline as JsonBlobSource.readConcat
    val readAcc = BlobMetrics.readAcc(spark, dir)
    spark.read
      .option("wholetext", "true")
      .option("recursiveFileLookup", "true")
      .text(dir)
      .select(input_file_name().as("blob_key"), col("value"))
      .as[(String, String)]
      .flatMap { case (k, content) =>
        readAcc.add(1L)
        val recs = splitCsv(content)
        if (recs.isEmpty) Iterator.empty
        else {
          val header = recs.head
          recs.tail.iterator.zipWithIndex.map { case (r, off) =>
            val extras =
              if (r.length <= header.length) Map.empty[String, String]
              else (header.length until r.length)
                .map(j => s"_extra_${j - header.length + 1}" -> r(j)).toMap
            (k, off.toLong, header.zip(r).toMap ++ extras,
              r.length != header.length)
          }
        }
      }
      .toDF("blob_key", "off", "fields", "ragged")
  }

  /** Ordered event view with the packed (blob ordinal, record offset)
    * cursor — same resume semantics as JsonBlobSource.asEventLogConcat,
    * values resolved by header NAME so blobs may disagree on column
    * order.
    */
  def asEventLog(spark: SparkSession, dir: String,
      eventTypeCol: String, foreignIdCol: String, tsCol: String): DataFrame = {
    val recs = readRecords(spark, dir)
    // ordinals from the shared metadata-only key listing (r13: the
    // previous distinct-on-recs ran splitCsv a second time)
    recs.join(broadcast(JsonBlobSource.blobOrdinals(spark, dir)), "blob_key")
      .withColumn("id",
        shiftleft(col("blob_ord"), JsonBlobSource.OffsetBits) + col("off"))
      .select(
        col("id"),
        element_at(col("fields"), eventTypeCol).as("eventType"),
        element_at(col("fields"), foreignIdCol).cast("long").as("foreignId"),
        element_at(col("fields"), tsCol).cast("timestamp").as("ts"),
        lit(0.0).as("value"),
        to_json(struct(col("blob_key"), col("off"), col("ragged"))).as("metadata"),
        col("ragged"))
  }

  /** Per-bucket poll loop with the reference's fixed-delay backoff
    * (rblob WithBackoff) — same wiring as [[JsonBlobSource.poll]].
    */
  def poll(backoffMs: Long = 60000L,
      stop: graft.events.Poller.PollStats => Boolean,
      sleep: Long => Unit = Thread.sleep,
      watcher: Option[graft.events.StreamWatcher] = None)(
      body: () => Long): graft.events.Poller.PollStats =
    JsonBlobSource.poll(backoffMs, stop, sleep, watcher)(body)
}
