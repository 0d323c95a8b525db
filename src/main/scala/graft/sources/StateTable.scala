package graft.sources

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.events.Patterns
import graft.util.AtomicDir

/** Bucket-partitioned materialized-state table with partition-level
  * MERGE upsert — the incremental event→state sink the reference's
  * core use case implies (reference: doc.go — events are pointers to
  * state changes that consumers materialize; rsql/eventstable.go for
  * the transactional contract).
  *
  * Layout: `dir/state_bucket=N/part-*.parquet` with
  * `N = pmod(xxhash64(foreignId), nBuckets)`. An upsert:
  *
  *   1. reduces the batch to latest-per-foreignId,
  *   2. computes the set of buckets the batch touches,
  *   3. reads ONLY those bucket partitions of the current state
  *      (partition-pruned scan — the predicate is on the partition
  *      column, so untouched buckets are never opened),
  *   4. merges (max-id row per foreignId wins),
  *   5. rewrites only the touched partitions, swapping each bucket
  *      directory atomically.
  *
  * Cost per batch is O(touched buckets), not O(state): a batch that
  * touches one entity rewrites at most one bucket. On a real cluster
  * with a table format this is verbatim a MERGE INTO a
  * bucket-partitioned Delta/Iceberg table (replace-partitions commit);
  * the per-bucket atomic swap here is the local-FS stand-in for that
  * metadata commit, at the same granularity.
  */
object StateTable {
  /** MERGE matched-clause: optional condition over `target.*` /
    * `source.*`, then either DELETE or UPDATE SET (name → expression;
    * empty set = replace the row with the source row).
    */
  final case class WhenMatched(
      condition: Option[org.apache.spark.sql.Column] = None,
      delete: Boolean = false,
      set: Map[String, org.apache.spark.sql.Column] = Map.empty)
}

final class StateTable(spark: SparkSession, dir: String, nBuckets: Int = 64) {
  require(nBuckets > 0)

  def exists: Boolean = Files.exists(Paths.get(dir))

  /** Current state (all buckets). `state_bucket` is the partition
    * column; filters on it prune to single directories.
    */
  def read: DataFrame = spark.read.parquet(dir)

  private def bucketCol = pmod(xxhash64(col("foreignId")), lit(nBuckets)).cast("int")

  /** Upsert a batch of events into the state table.
    * @return the bucket ids rewritten by this batch
    */
  def upsert(batch: DataFrame): Seq[Int] = {
    val incoming = Patterns.latestState(batch).withColumn("state_bucket", bucketCol)
    // Touched-bucket set: ≤ nBuckets small ints — a scalar-sized collect.
    val touched = incoming.select("state_bucket").distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    if (touched.isEmpty) return Nil

    val current =
      if (exists) read.filter(col("state_bucket").isin(touched.map(Integer.valueOf): _*))
      else incoming.limit(0)
    // allowMissingColumns: a state table written before a schema gained
    // a column (e.g. trace) still merges; the absent side reads null
    val merged = Patterns.latestState(current.unionByName(incoming, allowMissingColumns = true))
    // Stage the rewritten buckets, then swap each one atomically.
    // Staging avoids the read-from/write-to same-path conflict and
    // keeps every bucket old-or-new for concurrent readers.
    writeBuckets(merged, touched)
    touched
  }

  /** Generalized MERGE INTO over the bucket layout — the Delta/
    * Iceberg `MERGE` surface re-expressed on partition-granular
    * commits. Semantics (same clause model as Delta's builder):
    *
    *  - source rows are reduced to latest-per-foreignId first (a
    *    micro-batch can carry several updates for one key);
    *  - MATCHED + `whenMatched.condition` (default always) →
    *    DELETE when `whenMatched.delete`, else apply `whenMatched.set`
    *    (name → expression over `target.*`/`source.*` columns;
    *    unlisted columns keep the SOURCE value when `set` is empty —
    *    replace semantics — and the TARGET value otherwise);
    *  - MATCHED, condition false → target row kept unchanged;
    *  - NOT MATCHED (source only) → insert when `insertNotMatched`;
    *  - NOT MATCHED BY SOURCE (target only) → kept, unless
    *    `deleteNotMatchedBySource` (full-sync mode — this clause must
    *    examine every bucket, so it reads the WHOLE state: use for
    *    snapshot reconciliation, not per-batch upserts).
    *
    * Execution: one full-outer join per touched bucket set (source
    * side shuffles on the same key the buckets hash on), then the
    * usual staged write + per-bucket atomic swap. Cost is O(touched
    * buckets), exactly like `upsert` — which is itself the
    * `merge(batch)` default.
    * @return the bucket ids rewritten
    */
  def merge(
      source: DataFrame,
      whenMatched: StateTable.WhenMatched = StateTable.WhenMatched(),
      insertNotMatched: Boolean = true,
      deleteNotMatchedBySource: Boolean = false): Seq[Int] = {
    // The bucket swap below rewrites exactly the touched-bucket set; a
    // set-expression that rewrote the key (or the bucket itself) could
    // rehash a row into a bucket that is staged but never swapped in —
    // silent row loss. Enforce the invariant the plan relies on.
    require(!whenMatched.set.contains("foreignId") &&
        !whenMatched.set.contains("state_bucket"),
      "whenMatched.set must not assign foreignId or state_bucket: " +
        "rows cannot move between buckets mid-merge")
    val reduced = Patterns.latestState(source).withColumn("state_bucket", bucketCol)
    val touched: Seq[Int] =
      if (deleteNotMatchedBySource && exists)
        read.select("state_bucket").distinct().collect().map(_.getInt(0)).toSeq
          .concat(reduced.select("state_bucket").distinct().collect().map(_.getInt(0)).toSeq)
          .distinct.sorted
      else reduced.select("state_bucket").distinct()
        .collect().map(_.getInt(0)).toSeq.sorted
    if (touched.isEmpty) return Nil

    val current =
      if (exists) read.filter(col("state_bucket").isin(touched.map(Integer.valueOf): _*))
      else reduced.limit(0)
    // Schema evolution, both directions (same tolerance as upsert's
    // unionByName(allowMissingColumns)): a column either side lacks
    // reads as a typed null there.
    val outCols = current.columns.toSeq ++
      reduced.columns.filterNot(current.columns.contains)
    def align(df: DataFrame, other: DataFrame): DataFrame =
      outCols.foldLeft(df) { (d, c) =>
        if (d.columns.contains(c)) d
        else d.withColumn(c, lit(null).cast(other.schema(c).dataType))
      }
    val t = align(current, reduced).alias("target")
    val s = align(reduced, current).select(outCols.map(col): _*).alias("source")
    val j = t.join(s, col("target.foreignId") === col("source.foreignId"), "full_outer")
    val matched = col("target.foreignId").isNotNull && col("source.foreignId").isNotNull
    // MERGE clause conditions act only when TRUE: a NULL condition
    // must behave as false (keep/skip), not propagate into the filter.
    val matchCond = coalesce(whenMatched.condition.getOrElse(lit(true)), lit(false))
    // row survives unless: matched-delete fires, source-only without
    // insert, or target-only under full-sync delete
    val keep =
      when(matched, !(matchCond && lit(whenMatched.delete)))
        .when(col("target.foreignId").isNull, lit(insertNotMatched))
        .otherwise(lit(!deleteNotMatchedBySource))
    val defaultMatched: String => org.apache.spark.sql.Column =
      if (whenMatched.set.isEmpty) c => col(s"source.$c") else c => col(s"target.$c")
    val projected = j.filter(keep).select(outCols.map { c =>
      when(matched && matchCond, whenMatched.set.getOrElse(c, defaultMatched(c)))
        .when(matched, col(s"target.$c"))
        .when(col("target.foreignId").isNull, col(s"source.$c"))
        .otherwise(col(s"target.$c"))
        .as(c)
    }: _*)
    // bucket recomputed from the surviving key (set-exprs cannot move a
    // row between buckets: foreignId is the join key on both sides)
    val merged = projected.drop("state_bucket").withColumn("state_bucket", bucketCol)
    writeBuckets(merged, touched)
    touched
  }

  /** Stage `merged` and atomically swap each touched bucket. */
  private def writeBuckets(merged: DataFrame, touched: Seq[Int]): Unit = {
    val staging = dir + ".staging"
    AtomicDir.deleteRec(staging)
    merged.write.partitionBy("state_bucket").parquet(staging)
    Files.createDirectories(Paths.get(dir))
    touched.foreach { b =>
      val src = Paths.get(staging, s"state_bucket=$b")
      val dst = Paths.get(dir, s"state_bucket=$b")
      if (Files.exists(src)) AtomicDir.replace(src, dst)
      else AtomicDir.remove(dst) // clause deleted every row of the bucket
    }
    AtomicDir.deleteRec(staging)
  }

  /** Bounded-window state expiry — the mapGroupsWithState timeout
    * analog for this table: drop every row whose `ageCol` (default:
    * the src_batch provenance every streaming stage writes) is
    * strictly below `cutoff`, rewriting ONLY the buckets that
    * actually hold expired rows (the probe is a column-pruned scan of
    * one int64 column; untouched buckets are never rewritten). This
    * is what turns an ever-growing exact-dedup memory into a
    * trailing-window dedup at 100 TB: state stays O(window), at the
    * documented cost that a duplicate older than the window
    * re-admits — windowed-dedup semantics, chosen deliberately.
    * @return the bucket ids rewritten
    */
  def expire(cutoff: Long, ageCol: String = "src_batch"): Seq[Int] = {
    if (!exists) return Nil
    val touched = read.filter(col(ageCol) < cutoff)
      .select("state_bucket").distinct().collect().map(_.getInt(0)).toSeq.sorted
    if (touched.isEmpty) return Nil
    val keep = read.filter(
      col("state_bucket").isin(touched.map(Integer.valueOf): _*) &&
        col(ageCol) >= cutoff)
    writeBuckets(keep, touched)
    touched
  }

  /** Remove one entity from the state table, rewriting only its
    * bucket (right-to-be-forgotten on materialized state).
    */
  def delete(foreignId: Long): Unit = {
    if (!exists) return
    val b = spark.range(1).select(lit(foreignId).as("foreignId"))
      .select(bucketCol).collect()(0).getInt(0)
    val keep = read.filter(col("state_bucket") === b && col("foreignId") =!= foreignId)
    val staging = dir + ".staging"
    AtomicDir.deleteRec(staging)
    keep.write.partitionBy("state_bucket").parquet(staging)
    val src = Paths.get(staging, s"state_bucket=$b")
    val dst = Paths.get(dir, s"state_bucket=$b")
    if (Files.exists(src)) AtomicDir.replace(src, dst) else AtomicDir.remove(dst)
    AtomicDir.deleteRec(staging)
  }
}
