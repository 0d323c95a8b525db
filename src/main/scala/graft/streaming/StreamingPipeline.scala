package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.sources.StateTable

/** The composed ingestion pipeline as ONE Structured Streaming job
  * (SURVEY §2 C37+C37b+C40+C41b chained): per micro-batch,
  *
  *   ingest → exact dedup → near-dup admit → quality gate → seqpack
  *
  * Every stateful stage keeps the batch-provenance re-entrancy rule
  * of [[graft.dedup.StreamingDedup]]: history visible to a batch is
  * state admitted by OTHER batches, the sink is idempotent per batch
  * id, and a replay (crash after any state upsert, before the
  * checkpoint commit) re-derives byte-identical decisions — the
  * property must survive CHAINING, because a replayed batch re-runs
  * every stage against every state table at once (the spec replays
  * the whole job from a fresh checkpoint and diffs the output).
  *
  * State bounds per stage (100 TB sizing):
  *  - exact:  1 row per admitted distinct fingerprint (~50 B) in the
  *    fp-bucketed StateTable — reads prune to touched buckets;
  *  - bands:  4 rows per admitted doc (~40 B each), bucketed by band
  *    key;
  *  - gate:   stateless (pure column predicate);
  *  - packs:  nShards CURSOR rows per batch — (shard, batch) keyed,
  *    so the pack cursor history is O(shards × batches), scalars
  *    only; a replayed batch hides its own cursor rows and resumes
  *    from the latest earlier batch, exactly like the dedup stages.
  */
object StreamingPipeline {

  def run(
      spark: SparkSession,
      docsDir: String,
      stateRoot: String,
      outDir: String,
      checkpointDir: String,
      budget: Long = 64L,
      nShards: Int = 4,
      nBuckets: Int = 16,
      /** added to every micro-batch id before it reaches the state
        * tables and the sink — the recovery lever: see [[recover]].
        */
      batchIdOffset: Long = 0L): StreamingQuery = {
    val schema = spark.read.parquet(docsDir).schema
    val stream = spark.readStream.schema(schema).parquet(docsDir)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val out = processBatch(spark, batch, stateRoot, batchIdOffset + batchId,
          budget, nShards, nBuckets)
        StreamOps.idempotentParquetSink(outDir)(out, batchIdOffset + batchId)
        ()
      }
      .start()
  }

  /** Highest batch id any state table has committed — the recovery
    * cursor when the streaming checkpoint is lost. Column-pruned
    * metadata-sized read (src_batch only); a deployment that wants
    * this O(1) can mirror the value into a CursorStore at commit time.
    */
  def maxCommittedBatch(spark: SparkSession, stateRoot: String): Long =
    Seq("exact", "bands", "packs").flatMap { t =>
      val table = new StateTable(spark, s"$stateRoot/$t")
      if (table.exists)
        table.read.agg(max(col("src_batch"))).collect()(0) match {
          case r if r.isNullAt(0) => None
          case r => Some(r.getLong(0))
        }
      else None
    }.foldLeft(-1L)(math.max)

  /** Checkpoint-LOSS recovery: the checkpoint directory is gone, so
    * the file source will re-present EVERY input file under fresh
    * batch ids starting at 0. The state tables are the real source of
    * truth — each row carries src_batch provenance — so recovery is:
    * restart with a FRESH checkpoint and every batch id offset past
    * the highest committed batch. No re-presented batch then shares
    * an id with the state rows it wrote, so nothing is hidden from
    * it: every already-admitted doc collides with its own history and
    * drops (exact stage), already-rejected docs drop for the original
    * reasons, genuinely-new docs admit against the full history, and
    * pack cursors resume from the latest committed cursor. The output
    * directory gains only new-doc batches — zero duplicates — at the
    * cost of one full input re-read, after which the pipeline behaves
    * exactly as if the checkpoint had never been lost.
    */
  def recover(
      spark: SparkSession,
      docsDir: String,
      stateRoot: String,
      outDir: String,
      freshCheckpointDir: String,
      budget: Long = 64L,
      nShards: Int = 4,
      nBuckets: Int = 16): StreamingQuery =
    run(spark, docsDir, stateRoot, outDir, freshCheckpointDir, budget,
      nShards, nBuckets,
      batchIdOffset = maxCommittedBatch(spark, stateRoot) + 1L)

  /** One micro-batch through all four stages; returns the packed
    * admitted rows (doc columns + n_suspect_bands + n_tok + shard +
    * pack_id + src_batch). Factored for the replay spec. */
  def processBatch(spark: SparkSession, batch: DataFrame,
      stateRoot: String, batchId: Long, budget: Long, nShards: Int,
      nBuckets: Int): DataFrame = {
    val exactTable = new StateTable(spark, s"$stateRoot/exact", nBuckets)
    val bandTable = new StateTable(spark, s"$stateRoot/bands", nBuckets)
    val packTable = new StateTable(spark, s"$stateRoot/packs", 1)

    // stage 1: exact dedup (content fingerprints, other-batch history)
    val uniq = graft.dedup.StreamingDedup
      .admitBatch(spark, batch, exactTable, batchId)
      .drop("fp", "foreignId", "src_batch")
    // stage 2: near-dup admission (banded LSH history; identical
    // shingle sets drop, collisions flag)
    val admitted = graft.dedup.StreamingNearDup
      .admitBatch(spark, uniq, bandTable, batchId)
    // stage 3: quality gate — stateless column predicate
    val gated = admitted
      .filter(graft.text.TextOps.qualityKeepCol(col("text")))
      .withColumn("n_tok", size(graft.text.TextOps.tokens(col("text"))).cast("long"))
      .withColumn("shard", pmod(col("doc_id"), lit(nShards.toLong)))
    // stage 4: seqpack continuation — resume each shard's open pack
    // from the latest cursor any EARLIER batch committed (a replayed
    // batch's own cursor rows are invisible, so it re-packs
    // identically)
    val carried: Map[Long, (Long, Long)] =
      if (packTable.exists)
        packTable.read.filter(col("src_batch") =!= batchId)
          .groupBy("shard")
          .agg(max(struct(col("src_batch"), col("pack_id"), col("fill"))).as("s"))
          .select(col("shard"), col("s.pack_id"), col("s.fill"))
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      else Map.empty
    import spark.implicits._
    val packed = gated
      .select(col("shard"), col("doc_id"), col("n_tok"))
      .as[(Long, Long, Long)]
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "doc_id")
      .mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long)]
        var shard = -1L; var pack = 0L; var fill = 0L
        it.foreach { case (sh, id, n) =>
          if (sh != shard) {
            shard = sh
            val (p0, f0) = carried.getOrElse(sh, (0L, 0L))
            pack = p0; fill = f0
          }
          // same join rule as streamingSeqPack: a doc joins the open
          // pack iff it fits; the first doc of a pack always joins
          if (fill > 0 && fill + n > budget) { pack += 1; fill = 0L }
          fill += n
          out += ((sh, id, n, pack, fill))
        }
        out.iterator
      }
      .toDF("shard", "doc_id", "n_tok", "pack_id", "fill")
      // materialized once: the cursor agg AND the output join both
      // consume it, and the cursor upsert swaps the packs table the
      // plan would otherwise re-derive `carried` against
      .localCheckpoint()
    // commit each touched shard's cursor under this batch's key
    val cursors = packed.groupBy("shard")
      .agg(max(struct(col("doc_id"), col("pack_id"), col("fill"))).as("s"))
      .select(col("shard"), col("s.pack_id").as("pack_id"),
        col("s.fill").as("fill"))
      .withColumn("src_batch", lit(batchId))
    // (shard, batch) composite key in the int64 foreignId — shards
    // stay < 1e9; keeping per-batch cursor HISTORY (not one mutable
    // cursor) is what makes the stage replay-safe
    packTable.upsert(cursors
      .select((col("shard") * 1000000000L + lit(batchId)).as("foreignId"),
        lit(batchId).as("id"), col("shard"), col("pack_id"), col("fill"),
        col("src_batch")))
    admitted.drop("src_batch")
      .join(packed.select("doc_id", "n_tok", "shard", "pack_id"), "doc_id")
      .withColumn("src_batch", lit(batchId))
  }
}
