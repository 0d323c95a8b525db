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
    val staging = dir + ".staging"
    AtomicDir.deleteRec(staging)
    merged.write.partitionBy("state_bucket").parquet(staging)
    Files.createDirectories(Paths.get(dir))
    touched.foreach { b =>
      val src = Paths.get(staging, s"state_bucket=$b")
      val dst = Paths.get(dir, s"state_bucket=$b")
      if (Files.exists(src)) AtomicDir.replace(src, dst)
      else AtomicDir.remove(dst) // bucket emptied (cannot happen on upsert; kept for delete paths)
    }
    AtomicDir.deleteRec(staging)
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
