package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Exactly-once STREAMING corpus dedup — the arriving-data composition
  * of dd_incremental: each micro-batch of documents is admitted only
  * where its content fingerprint has never been seen, with the seen-
  * fingerprint state in the bucket-partitioned StateTable (keyed on
  * the 64-bit fingerprint hash), so a batch reads and rewrites only
  * the fp-buckets it touches — O(batch), never O(history).
  *
  * Exactly-once under at-least-once replay, WITHOUT a transactional
  * store, via batch provenance: every state row carries the batch id
  * that admitted it, and the admit decision anti-joins only state rows
  * from OTHER batches. A replayed batch (crash after the state upsert,
  * before the checkpoint commit) therefore re-derives the identical
  * admit set — its own half-written state rows are invisible to it —
  * re-overwrites its own `batch_id=N` output partition (idempotent
  * sink), and re-upserts byte-identical state rows (idempotent
  * latest-per-key). Every path is re-entrant.
  *
  * At 100 TB: state is fingerprints + scalars (not documents), hashed
  * across buckets; the anti-join keys on the same value the buckets
  * hash on, so state reads prune to touched buckets, and the
  * per-batch window is batch-local (partitioned by fp-hash).
  */
object StreamingDedup {

  /** Start the availableNow dedup pass over `docsDir`.
    * @return the running query (awaitTermination for the bounded run)
    */
  def run(
      spark: SparkSession,
      docsDir: String,
      stateDir: String,
      outDir: String,
      checkpointDir: String,
      nBuckets: Int = 16): StreamingQuery = {
    val schema = spark.read.parquet(docsDir).schema
    val stream = spark.readStream.schema(schema).parquet(docsDir)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val table = new graft.sources.StateTable(spark, stateDir, nBuckets)
        val admitted = admitBatch(spark, batch, table, batchId)
        graft.streaming.StreamOps.idempotentParquetSink(outDir)(
          admitted.drop("foreignId"), batchId)
        ()
      }
      .start()
  }

  /** One micro-batch of the exact-dedup admission — the foreachBatch
    * body of [[run]], factored so StreamingPipeline chains it with
    * the near-dup / gate / pack stages inside ONE job. Admits rows
    * whose fingerprint no OTHER batch has admitted (batch-provenance
    * re-entrancy, see object Scaladoc), upserts the admitted
    * fingerprints, and returns the admitted rows
    * (batch columns + fp + foreignId + src_batch).
    */
  def admitBatch(spark: SparkSession, batch: DataFrame,
      table: graft.sources.StateTable, batchId: Long): DataFrame = {
    val keyed = batch
      .withColumn("fp", graft.text.TextOps.fingerprint(col("text")))
      .withColumn("foreignId", xxhash64(col("fp")))
    // batch-local winner per fingerprint first (a batch can carry
    // its own dups): deterministic min doc_id
    val w = Window.partitionBy("foreignId").orderBy("doc_id")
    val firsts = keyed.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    // history = state admitted by OTHER batches; rows this batch
    // wrote in a failed earlier attempt are invisible, so a replay
    // re-derives the same decision
    val novel =
      if (table.exists)
        firsts.join(
          table.read.filter(col("src_batch") =!= batchId).select("foreignId"),
          Seq("foreignId"), "left_anti")
      else firsts
    // materialize the decision BEFORE the upsert: the plan reads the
    // state table, and the upsert's atomic bucket swap invalidates
    // that file listing — a caller evaluating the returned frame
    // lazily (the composed pipeline does) must see the decision, not
    // a FILE_NOT_EXIST on swapped-away state parquet
    val admitted = novel.withColumn("src_batch", lit(batchId))
      .localCheckpoint()
    table.upsert(admitted
      .select(col("foreignId"), col("doc_id").as("id"),
        col("doc_id"), col("fp"), col("src_batch")))
    admitted
  }
}
