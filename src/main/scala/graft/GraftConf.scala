package graft

import org.apache.spark.sql.SparkSession

/** One tunable knob: key, shipped default (as the string Spark's conf
  * layer stores), and the one-line doc rendered into CONFIG.md.
  */
final case class ConfKey(key: String, default: String, doc: String)

/** The complete `spark.graft.*` configuration surface.
  *
  * Every runtime tunable the engine reads from the session conf is
  * declared here — call sites resolve keys through this registry, so
  * the table below (and CONFIG.md, spec-checked against it) cannot
  * drift from the code. Operator-level knobs that are plain function
  * parameters (e.g. `minhashPairs(maxBucket = …)`) are API surface,
  * not session conf, and are documented on the function instead.
  */
object GraftConf {

  val TopKRewrite = ConfKey("spark.graft.topk.rewrite", "true",
    "Kill-switch for the rank-filter -> TopKPerKey bounded-heap rewrite " +
      "(plans/RankFilterToTopK). Disable to fall back to the full " +
      "window-sort plan when debugging plan differences.")

  val TopKRewriteMaxK = ConfKey("spark.graft.topk.rewrite.maxK", "1000",
    "Largest rank bound the TopKPerKey rewrite will claim. A rank " +
      "filter with k above this keeps the window plan: per-key heaps of " +
      "unbounded k would hold k rows per key per partition in memory.")

  val AnnLshTables = ConfKey("spark.graft.ann.lsh.tables", "2",
    "Number of independent hyperplane-LSH tables L in ann_lsh. More " +
      "tables raise recall and candidate volume roughly linearly; the " +
      "bench records planted-clone recall at the shipped default. " +
      "r14: default 4 -> 2 — multi-probe probing (ann.lsh.probes) buys " +
      "the recall the two dropped tables provided, at half the index " +
      "storage and half the bucket-join input.")

  val AnnLshProbes = ConfKey("spark.graft.ann.lsh.probes", "2",
    "Extra buckets probed per table in ann_lsh (multi-probe LSH, Lv " +
      "et al. VLDB 2007): each probe also checks the buckets reached " +
      "by flipping the hyperplanes it sits closest to. Probe-side " +
      "only — the corpus still indexes each vector into exactly one " +
      "bucket per table, so index size is unchanged by this knob.")

  val AnnLshMaxBucket = ConfKey("spark.graft.ann.lsh.maxBucket", "10000",
    "Per-(table,bucket) membership cap in ann_lsh. Buckets larger than " +
      "this are dropped before the probe join — the standard LSH skew " +
      "guard bounding worst-case candidate fan-out at corpus scale.")

  val SeqpackShards = ConfKey("spark.graft.seqpack.shards", "8",
    "Shard count for greedy sequence packing (tx_seqpack). Packing is " +
      "sequential within a shard; size as corpus_tokens / (budget * 1e5) " +
      "so each shard's doc list stays executor-memory-resident.")

  val DedupMinhashTargetJ = ConfKey("spark.graft.dedup.minhash.targetJ", "0.8",
    "Jaccard target for the MinHash-LSH banding of the near-dup tier " +
      "(C2 batch + C37b streaming). The (bands, rowsPerBand) split of the " +
      "32-permutation signature is chosen as the dd_lsh_plan table's " +
      "`best` row for this target: S-curve threshold (1/b)^(1/r) closest " +
      "to targetJ, ties to fewer rows per band. Default 0.8 yields 4x8 " +
      "(threshold ~0.84); 0.5 yields 8x4 (~0.59), admitting more " +
      "candidates at more verify cost.")

  val PrefixBroadcastMaxRows = ConfKey("spark.graft.prefix.broadcastMaxRows",
    (1L << 22).toString,
    "Checked-bound threshold for the hybrid prefix-scan operators " +
      "(ev_lateness's per-block frontier, ev_rfm_segments's monetary " +
      "histogram): frames whose measured row count is at or under the " +
      "bound use the window+broadcast prefix form; larger frames take " +
      "the range-partitioned two-pass (rangeCumHist / Prefix.rangeCumMax) " +
      "with a co-partitioned join-back. Both paths are exact; the knob " +
      "exists so tests can force the scale path on small data.")

  /** Every key, in the order CONFIG.md documents them. */
  val all: Seq[ConfKey] = Seq(
    TopKRewrite, TopKRewriteMaxK, AnnLshTables, AnnLshProbes, AnnLshMaxBucket,
    SeqpackShards, DedupMinhashTargetJ, PrefixBroadcastMaxRows)

  def getDouble(s: SparkSession, k: ConfKey): Double = get(s, k).toDouble

  def get(s: SparkSession, k: ConfKey): String = s.conf.get(k.key, k.default)
  def getInt(s: SparkSession, k: ConfKey): Int = get(s, k).toInt
  def getLong(s: SparkSession, k: ConfKey): Long = get(s, k).toLong
  def getBoolean(s: SparkSession, k: ConfKey): Boolean = get(s, k).toBoolean
}
