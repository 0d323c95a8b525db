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
  */
object JsonBlobSource {

  /** Offset bits in the packed id: 2^40 records per blob. */
  val OffsetBits = 40

  /** Decode the blob ordinal from a packed event id. */
  def blobOrdinal(id: Column): Column = shiftright(id, OffsetBits)

  /** Decode the in-blob offset from a packed event id. */
  def blobOffset(id: Column): Column = id.bitwiseAND(lit((1L << OffsetBits) - 1))

  /** Batch view: every record of every blob, with its blob key. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.json(dir).withColumn("blob_key", input_file_name())

  /** Ordered event view with (blob key, offset) cursor semantics.
    * The only driver-side state is the sorted key list — the blob
    * listing the reference's bucket iterator holds anyway.
    */
  def asEventLog(spark: SparkSession, dir: String,
      eventTypeCol: String, foreignIdCol: String, tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val df = read(spark, dir)
    // lexicographic key → ordinal; |blobs| rows, broadcast back
    val keys = df.select("blob_key").distinct()
      .collect().map(_.getString(0)).sorted
    import spark.implicits._
    val ordinals = keys.zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toSeq
      .toDF("blob_key", "blob_ord")
    val perBlob = Window.partitionBy("blob_key").orderBy(col(tsCol))
    df.join(broadcast(ordinals), "blob_key")
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

  /** Live tail of the blob directory as a stream (new blobs appear as
    * they land, like the reference's bucket polling).
    */
  def stream(spark: SparkSession, dir: String, schema: StructType,
      maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)
      .withColumn("blob_key", input_file_name())
}
