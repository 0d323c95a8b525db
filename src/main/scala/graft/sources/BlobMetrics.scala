package graft.sources

import java.util.concurrent.atomic.AtomicLong
import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

/** Per-bucket blob-source counters — parity with the reference's
  * rblob metrics (rblob/metrics.go:8–22):
  *
  *  - `reads` ↔ reflex_rblob_read_total: blobs opened for decode.
  *    Ticked EXECUTOR-side via a Spark LongAccumulator (the
  *    distributed analog of the reference's process-local prometheus
  *    counter) once per blob a concat reader actually decodes. Like
  *    any read-path counter it measures WORK, not distinct blobs:
  *    re-running a frame (a second action, a retried task) re-reads
  *    and therefore re-ticks — exactly what an operator watching
  *    ingestion I/O wants to see.
  *  - `listSkipTotal` ↔ reflex_rblob_list_skip_total: listed keys a
  *    resume listing walked past before the first key > cursor
  *    ("should be zero, otherwise fix makeStartAfter" — nonzero means
  *    the backend has no StartAfter pushdown and resume listings
  *    re-scan the bucket head). Driver-side, since listing is a
  *    driver operation.
  *
  * Keyed by the dir/bucket URI string, matching the reference's
  * per-bucket label.
  */
object BlobMetrics {
  private val readAccs = TrieMap.empty[String, LongAccumulator]
  private val skips = TrieMap.empty[String, AtomicLong]

  private[sources] def readAcc(spark: SparkSession, dir: String): LongAccumulator =
    readAccs.getOrElseUpdate(dir,
      spark.sparkContext.longAccumulator(s"graft.rblob.read_total($dir)"))

  private[sources] def recordListSkips(dir: String, n: Long): Unit =
    if (n > 0) { skips.getOrElseUpdate(dir, new AtomicLong).addAndGet(n); () }

  /** Blobs read (opened + decoded) for this bucket so far. */
  def reads(dir: String): Long =
    readAccs.get(dir).map(_.value.longValue).getOrElse(0L)

  /** List results skipped across resume listings for this bucket. */
  def listSkipTotal(dir: String): Long =
    skips.get(dir).map(_.get).getOrElse(0L)

  def reset(dir: String): Unit = {
    readAccs.get(dir).foreach(_.reset())
    skips.remove(dir)
    ()
  }
}
