package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.expressions.Window

/** Blob-store event source (reference: rblob/blob.go — "stream the
  * content of consecutive blobs as events", JSON decoder by default;
  * rblob/json.go).
  *
  * Spark-first mapping: a directory/bucket of JSON blobs IS a
  * DataFrame source. The reference's cursor is (blob key, offset in
  * blob); here the blob key is `input_file_name` and ordering is the
  * lexicographic key order the reference guarantees. For live tailing
  * the same directory is a file-stream source — new blobs are
  * discovered exactly like the reference's polling, with
  * `maxFilesPerTrigger` as the backoff analog.
  */
object JsonBlobSource {

  /** Batch view: every record of every blob, with its blob key. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.json(dir).withColumn("blob_key", input_file_name())

  /** Ordered event view: records get monotone ids in (blob key,
    * record) order — the reference's cursor semantics. The global
    * window is the faithful single-log view; at scale ids are
    * per-blob (key, offset) pairs and this ordering is only ever
    * materialized per consumer slice.
    */
  def asEventLog(spark: SparkSession, dir: String,
      eventTypeCol: String, foreignIdCol: String, tsCol: String): DataFrame = {
    val w = Window.orderBy(col("blob_key"), col(tsCol))
    read(spark, dir)
      .withColumn("id", row_number().over(w).cast("long") - 1)
      .select(
        col("id"),
        col(eventTypeCol).as("eventType"),
        col(foreignIdCol).cast("long").as("foreignId"),
        col(tsCol).cast("timestamp").as("ts"),
        lit(0.0).as("value"),
        to_json(struct(col("blob_key"))).as("metadata"))
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
