package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming NEAR-dup admission — the LSH tier of [[StreamingDedup]]:
  * each arriving document carries its 4 minhash band keys (the same
  * 4×8 banding as the batch tier) and its 128-bit shingle-SET
  * fingerprint; the banded history lives in the bucket-partitioned
  * StateTable keyed on the band key, ONE representative per
  * (band, key) — the standard bounded-state streaming LSH table.
  *
  * Per batch:
  *  - a doc whose set fingerprint equals ANY colliding band
  *    representative's is a duplicate (identical shingle set — catches
  *    reorderings exact content-hash dedup misses) and is dropped;
  *  - a doc colliding with different-content representatives is
  *    admitted FLAGGED (`n_suspect_bands` > 0) — the quarantine
  *    signal an async exact-verify pass consumes; expected flag
  *    probability for true Jaccard s is the banding curve
  *    1 − (1 − s⁸)⁴ (DedupOps.bandingRecall);
  *  - admitted docs upsert their band rows (latest-per-key: a
  *    genuine 64-bit band collision replaces that bucket's rep and
  *    costs one of the older doc's 4 bands — the usual LSH sketch
  *    trade, never the exactness of the fingerprint equality test).
  *
  * Exactly-once under replay exactly like StreamingDedup: history
  * visibility excludes rows this batch wrote (src_batch provenance),
  * the sink is idempotent per batch id, and the upsert re-writes
  * byte-identical rows. State is 4 × ~40 B per admitted doc.
  */
object StreamingNearDup {

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
        graft.streaming.StreamOps.idempotentParquetSink(outDir)(
          admitBatch(spark, batch, table, batchId), batchId)
        ()
      }
      .start()
  }

  /** One micro-batch of the near-dup admission — the foreachBatch
    * body of [[run]], factored so StreamingPipeline chains it.
    * Drops identical-shingle-set duplicates against the banded
    * history (other batches only — re-entrant under replay), flags
    * band collisions (`n_suspect_bands`), upserts the admitted band
    * rows, and returns admitted batch rows + n_suspect_bands +
    * src_batch.
    */
  def admitBatch(spark: SparkSession, batch: DataFrame,
      table: graft.sources.StateTable, batchId: Long): DataFrame = {
    import spark.implicits._
    // one typed pass: band keys + set fingerprint per doc (the
    // memoized batch-tier signature cache is wrong here — every
    // micro-batch is a new plan, entries would pile up)
    // banding from the same dd_lsh_plan `best` selection as the batch
    // tier (spark.graft.dedup.minhash.targetJ) — C2 and C37b admit
    // along the same S-curve by construction
    val (_, rowsPerBand) = DedupOps.configuredBanding(spark)
    val sigs = batch
      .select(col("doc_id"), graft.text.TextOps.normalize(col("text")).as("norm"))
      .as[(Long, String)]
      .map { case (id, norm) =>
        val n = if (norm == null) "" else norm
        val shh = graft.util.Hashing.charShingleHashes(n, 4)
        val (f1, f2) = graft.util.Hashing.setFingerprint(shh)
        val bds = graft.util.Hashing.bands(
          graft.util.Hashing.minhashSigL(shh, DedupOps.MinhashSigLen), rowsPerBand)
        (id, bds.toSeq, f1, f2)
      }
      .toDF("doc_id", "bands", "fp1", "fp2")
    // batch-local canonical per identical shingle set
    val w = Window.partitionBy("fp1", "fp2").orderBy("doc_id")
    val firsts = sigs.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    val bandRows = firsts
      .select(col("doc_id"), col("fp1"), col("fp2"),
        explode(col("bands")).as("foreignId"))
    val verdict =
      if (table.exists) {
        val hist = table.read.filter(col("src_batch") =!= batchId)
          .select(col("foreignId"),
            col("fp1").as("h1"), col("fp2").as("h2"))
        bandRows.join(hist, Seq("foreignId"), "left")
          .groupBy("doc_id")
          .agg(
            max(when(col("h1") === col("fp1") &&
              col("h2") === col("fp2"), 1).otherwise(0)).as("is_dup"),
            sum(when(col("h1").isNotNull &&
              (col("h1") =!= col("fp1") || col("h2") =!= col("fp2")), 1)
              .otherwise(0)).cast("long").as("n_suspect_bands"))
      } else {
        firsts.select(col("doc_id"), lit(0).as("is_dup"),
          lit(0L).as("n_suspect_bands"))
      }
    // materialized BEFORE the upsert: the verdict plan reads the band
    // table, whose buckets the upsert atomically swaps — see
    // StreamingDedup.admitBatch
    val admitted = firsts.join(verdict, "doc_id")
      .filter(col("is_dup") === 0)
      .localCheckpoint()
    table.upsert(admitted
      .select(col("doc_id"), col("fp1"), col("fp2"),
        explode(col("bands")).as("foreignId"))
      .select(col("foreignId"), col("doc_id").as("id"),
        col("doc_id"), col("fp1"), col("fp2"),
        lit(batchId).as("src_batch")))
    batch.join(admitted.select("doc_id", "n_suspect_bands"), "doc_id")
      .withColumn("src_batch", lit(batchId))
  }
}
