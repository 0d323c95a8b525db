package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Blob-store event source (reference: rblob/blob.go — "stream the
  * content of consecutive blobs as events", JSON decoder by default;
  * rblob/json.go).
  *
  * Spark-first mapping: a directory/bucket of JSON blobs IS a
  * DataFrame source. The reference's cursor is (blob key, offset in
  * blob); here that pair is PACKED into the long event id —
  * `id = blob_ordinal << 40 | in_blob_offset` — where ordinals follow
  * the lexicographic key order the reference guarantees. Ids are
  * monotone in (key, offset) order, so the usual `id > cursor` slice
  * resumes mid-blob exactly like the reference's cursor, and NO global
  * sort or single-partition window exists anywhere: offsets come from
  * a window PARTITIONED by blob key, ordinals from the key listing
  * (O(|blobs|), the same listing any file source performs).
  *
  * For live tailing the same directory is a file-stream source — new
  * blobs are discovered exactly like the reference's polling, with
  * `maxFilesPerTrigger` as the backoff analog.
  *
  * Storage seam (reference rblob/blob.go:69 takes any go-cloud
  * `*blob.Bucket` — file/s3/gcs/mem): every read here goes through
  * Spark's Hadoop `FileSystem` resolver, so `dir` is any FS URI —
  * a bare path, `file://`, `hdfs://`, or `s3a://` with the connector
  * on the cluster classpath. No `java.io.File` anywhere in this
  * source. SourcesSpec proves the seam by running the gzip +
  * concatenated-JSON + mid-blob-resume suite through both a `file://`
  * URI and a custom-scheme FileSystem registered via `fs.*.impl` —
  * the same registration shape the S3 connector uses.
  */
object JsonBlobSource {

  /** Offset bits in the packed id: 2^40 records per blob. */
  val OffsetBits = 40

  /** The reference's STRING cursor format (rblob/blob.go:380 —
    * `key|NN|offset` with NN the 2-digit decimal length of the offset,
    * making cursors lexicographically orderable; `key|eof` marks a
    * drained blob). With the r11 string-cursor stores
    * (CursorStore.getStr/setStr) these persist as-is instead of
    * packing into longs.
    */
  def cursorString(blobKey: String, offset: Long): String = {
    val o = offset.toString
    f"$blobKey|${o.length}%02d|$o"
  }

  /** End-of-blob cursor (rblob/blob.go:376 `eof`). */
  def cursorEof(blobKey: String): String = s"$blobKey|eof"

  /** Parse a reference-format cursor → (key, offset, eof). Empty
    * string = genesis (None), matching rblob/blob.go:390 parseCursor.
    */
  def parseCursor(cur: String): Option[(String, Long, Boolean)] = {
    if (cur.isEmpty) return None
    val i = cur.lastIndexOf('|')
    require(i > 0, s"invalid cursor: $cur")
    if (cur.substring(i + 1) == "eof") Some((cur.substring(0, i), 0L, true))
    else {
      val j = cur.lastIndexOf('|', i - 1)
      require(j > 0, s"invalid cursor: $cur")
      Some((cur.substring(0, j), cur.substring(i + 1).toLong, false))
    }
  }

  /** Decode the blob ordinal from a packed event id. */
  def blobOrdinal(id: Column): Column = shiftright(id, OffsetBits)

  /** Decode the in-blob offset from a packed event id. */
  def blobOffset(id: Column): Column = id.bitwiseAND(lit((1L << OffsetBits) - 1))

  /** Sorted blob keys for ordinal assignment, from a GENUINELY
    * metadata-only FileSystem listing (r14, closing the r13 ADVICE
    * both ways: the r13 wholetext read paid full blob I/O to emit one
    * row per blob, and this replaces it with the recursive listing the
    * reference's bucket iterator performs — rblob/blob.go getNextKey's
    * List call). Key strings are `SparkPath.fromFileStatus(_).
    * urlEncoded`, byte-identical to the `input_file_name()` values the
    * decode frames carry (ProbePaths measured: Hadoop `Path.toString`
    * is `file:/…` unencoded, input_file_name is `file:///…`
    * URL-encoded; SparkPath is the one constructor that matches) —
    * SourcesSpec pins the equality, spaces and nested prefixes
    * included. Hidden files (`_`/`.` prefixes) are excluded exactly
    * like Spark's own FileIndex, so the ordinal basis matches what the
    * record readers can ever surface.
    *
    * ORDINAL BASIS (documented per the r13 ADVICE): ordinals number
    * every non-hidden file the listing returns — including record-less
    * blobs (zero-byte files, header-only CSVs), which consume an
    * ordinal without producing events. That is the reference's id
    * space too (its bucket iterator walks every listed key and an
    * empty blob just yields zero decodes), and it makes ids a pure
    * function of the directory LISTING rather than of decode results.
    * Driver-side state is the |blobs| key list the reference's bucket
    * iterator holds anyway.
    */
  def blobKeys(spark: SparkSession, dir: String): Seq[String] = {
    val hPath = new org.apache.hadoop.fs.Path(dir)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    // recursive listStatus rather than listFiles: listFiles wraps
    // results in LocatedFileStatus, whose constructor eagerly loads
    // permissions — RawLocalFileSystem subclasses registered under a
    // non-file scheme (the s3a registration shape SourcesSpec pins)
    // blow up there, while plain FileStatus defers it
    def walk(p: org.apache.hadoop.fs.Path): Iterator[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(p).iterator.flatMap { st =>
        if (st.isDirectory) walk(st.getPath) else Iterator.single(st)
      }
    walk(hPath).collect {
      case st if !st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith(".") =>
        org.apache.spark.paths.SparkPath.fromFileStatus(st).urlEncoded
    }.toSeq.sorted
  }

  /** The reference's getNextKey (rblob/blob.go:330): the first blob
    * key strictly after `prev` in lexicographic listing order, None
    * when the bucket is drained. Every listed key ≤ prev ticks the
    * per-bucket list-skip counter (rblob/metrics.go list_skip_total —
    * "should be zero, otherwise fix makeStartAfter"): a backend with a
    * real StartAfter pushdown never yields them, so a nonzero count is
    * the signal that resume listings are re-scanning the bucket head.
    * The local FileSystem listing here has no StartAfter, mirroring
    * gocloud's non-S3 backends — the counter is the observability, the
    * sorted-key early exit the mitigation.
    */
  def nextKeyAfter(spark: SparkSession, dir: String, prev: String): Option[String] = {
    val keys = blobKeys(spark, dir)
    val idx = keys.indexWhere(_ > prev)
    BlobMetrics.recordListSkips(dir, if (idx < 0) keys.size.toLong else idx.toLong)
    if (idx < 0) None else Some(keys(idx))
  }

  /** The broadcastable (blob_key, blob_ord) frame over blobKeys. */
  def blobOrdinals(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    blobKeys(spark, dir).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }
      .toDF("blob_key", "blob_ord")
  }

  /** Batch view: every record of every blob, with its blob key.
    * `recursiveFileLookup` descends bucket-style key prefixes
    * (`2019/12/31/blob`, the reference's date-layout testdata);
    * `.json.gz` blobs decompress transparently via the Hadoop codec
    * chain — the same extension-driven behavior gocloud's bucket
    * readers give the reference.
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").json(dir)
      .withColumn("blob_key", input_file_name())

  /** Split a blob of CONCATENATED top-level JSON values (the
    * reference's default decoder — `json.Decoder` reads back-to-back
    * values with no newline framing, rblob/json.go:20) into the raw
    * value strings, in decoder order. Scans once, tracking string/
    * escape state and bracket depth; top-level values must be objects
    * or arrays (reference DTOs always are).
    */
  def splitConcatJson(s: String): IndexedSeq[String] = {
    val out = IndexedSeq.newBuilder[String]
    var i = 0
    var start = -1
    var depth = 0
    var inStr = false
    var esc = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true
        case '{' | '[' =>
          if (depth == 0) start = i
          depth += 1
        case '}' | ']' =>
          depth -= 1
          if (depth == 0 && start >= 0) { out += s.substring(start, i + 1); start = -1 }
        case _ => ()
      }
      i += 1
    }
    out.result()
  }

  /** Reference-format batch view: blobs of concatenated JSON values
    * (no line framing), possibly gzipped, under bucket-style prefixes.
    * One task per blob (`wholetext`), records split in decoder order —
    * `off` is the TRUE in-blob decode offset, exactly the offset the
    * reference's `key|offset` cursor counts (rblob/blob.go:330
    * loadCurrentBlob gobbles `offset+1` decodes to resume).
    */
  def readConcat(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // per-bucket read counter (rblob/metrics.go read_total): one tick
    // per blob decoded, executor-side through the accumulator
    val readAcc = BlobMetrics.readAcc(spark, dir)
    spark.read
      .option("wholetext", "true")
      .option("recursiveFileLookup", "true")
      .text(dir)
      .select(input_file_name().as("blob_key"), col("value"))
      .as[(String, String)]
      .flatMap { case (k, content) =>
        readAcc.add(1L)
        splitConcatJson(content).zipWithIndex.map { case (j, off) => (k, off.toLong, j) }
      }
      .toDF("blob_key", "off", "json")
  }

  /** Reference-format blobs as an ordered event log with the packed
    * (blob ordinal, decode offset) cursor — byte-for-byte the
    * reference's resume semantics: `id > cursor` skips exactly the
    * records a reference consumer at `key|offset` has seen, including
    * mid-blob positions.
    */
  def asEventLogConcat(spark: SparkSession, dir: String, schema: StructType,
      eventTypeCol: String, foreignIdCol: String, tsCol: String): DataFrame = {
    val recs = readConcat(spark, dir)
    recs.join(broadcast(blobOrdinals(spark, dir)), "blob_key")
      .withColumn("id", shiftleft(col("blob_ord"), OffsetBits) + col("off"))
      .withColumn("e", from_json(col("json"), schema))
      .select(
        col("id"),
        col("e").getField(eventTypeCol).as("eventType"),
        col("e").getField(foreignIdCol).cast("long").as("foreignId"),
        col("e").getField(tsCol).cast("timestamp").as("ts"),
        lit(0.0).as("value"),
        to_json(struct(col("blob_key"), col("off"))).as("metadata"))
  }

  /** Ordered event view with (blob key, offset) cursor semantics.
    * The only driver-side state is the sorted key list — the blob
    * listing the reference's bucket iterator holds anyway.
    */
  def asEventLog(spark: SparkSession, dir: String,
      eventTypeCol: String, foreignIdCol: String, tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val df = read(spark, dir)
    // lexicographic key → ordinal; |blobs| rows, broadcast back
    val perBlob = Window.partitionBy("blob_key").orderBy(col(tsCol))
    df.join(broadcast(blobOrdinals(spark, dir)), "blob_key")
      .withColumn("off", row_number().over(perBlob).cast("long") - 1L)
      .withColumn("id", shiftleft(col("blob_ord"), OffsetBits) + col("off"))
      .select(
        col("id"),
        col(eventTypeCol).as("eventType"),
        col(foreignIdCol).cast("long").as("foreignId"),
        col(tsCol).cast("timestamp").as("ts"),
        lit(0.0).as("value"),
        to_json(struct(col("blob_key"), col("off"))).as("metadata"))
  }

  /** Per-bucket poll loop with the reference's backoff semantics
    * (rblob/blob.go:32 WithBackoff: "the backoff duration before
    * querying the underlying bucket for new blobs", default one
    * minute, a FIXED delay — not a ladder). Wired into the Poller
    * seam with initial == max so an idle source re-lists every
    * `backoffMs`, exactly the reference's cadence; a productive poll
    * re-polls immediately, and a `watcher` (wake-on-insert) short-
    * circuits the park like everywhere else in the engine.
    *
    * `body` is one poll over this bucket — typically "list keys after
    * the cursor, consume new records, return how many".
    */
  def poll(backoffMs: Long = 60000L,
      stop: graft.events.Poller.PollStats => Boolean,
      sleep: Long => Unit = Thread.sleep,
      watcher: Option[graft.events.StreamWatcher] = None)(
      body: () => Long): graft.events.Poller.PollStats =
    graft.events.Poller.run(
      initialBackoffMs = backoffMs, maxBackoffMs = backoffMs,
      stop = stop, sleep = sleep, watcher = watcher)(body)

  /** Live tail of the blob directory as a stream (new blobs appear as
    * they land, like the reference's bucket polling).
    */
  def stream(spark: SparkSession, dir: String, schema: StructType,
      maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("recursiveFileLookup", "true")
      .json(dir)
      .withColumn("blob_key", input_file_name())
}
