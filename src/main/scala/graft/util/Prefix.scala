package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Exclusive prefix scans (sum / max) over (key, value) frames — the
  * machinery behind every "running total / frontier over per-block
  * aggregates" pattern in the engine. An unpartitioned
  * `Window.orderBy(k)` executes as ONE partition, which is only
  * acceptable when the frame is provably small; the frames these
  * serve (per-4096-id blocks, per-value histograms) TRACK the corpus,
  * so `cumExcl` measures the size and picks the window form (bound
  * verified) or the range-partitioned two-pass scan. The range forms
  * follow Queries.centsCumHist: checkpoint, range-exchange +
  * in-partition sort on the key, collect 32 per-partition partials,
  * broadcast the exclusive driver scan back.
  */
object Prefix {

  /** Checked-bounded EXCLUSIVE prefix aggregate over a (key, value)
    * frame with unique keys — THE entry point for every per-id-block
    * / per-value-histogram prefix in the engine. The frame's row
    * count is MEASURED (one small job on the checkpointed frame):
    * at or under spark.graft.prefix.broadcastMaxRows it keeps the
    * window form — a single-partition exchange of a frame whose
    * bound is now verified, not assumed — and above it takes the
    * range-partitioned two-pass scan. Returns the (k, v, prefix)
    * frame plus the smallness verdict so callers broadcast the
    * join-back only when the check passed. `prefix` is 0 for the
    * first key under "sum" and null under "max".
    */
  def cumExcl(s: SparkSession, df: DataFrame, kCol: String, vCol: String,
      op: String): (DataFrame, Boolean) = {
    val ck = df.select(col(kCol).cast("long"), col(vCol).cast("long"))
      .localCheckpoint()
    val small = ck.count() <=
      graft.GraftConf.getLong(s, graft.GraftConf.PrefixBroadcastMaxRows)
    val out =
      if (small) {
        val w = Window.orderBy(kCol).rowsBetween(Window.unboundedPreceding, -1)
        val pfx = op match {
          case "sum" => coalesce(sum(vCol).over(w), lit(0L))
          case "max" => max(vCol).over(w)
          case other => throw new IllegalArgumentException(s"op $other")
        }
        ck.withColumn("prefix", pfx)
      } else op match {
        case "sum" =>
          val (cum, _, _) = rangeCumHist(s, ck, kCol, vCol)
          cum.withColumnRenamed("cum_excl", "prefix")
        case "max" => rangeCumMax(s, ck, kCol, vCol)
        case other => throw new IllegalArgumentException(s"op $other")
      }
    (out, small)
  }

  /** Range-partitioned EXCLUSIVE prefix sum over a (value, count)
    * histogram — the scale path of `cumExcl("sum")`, public because
    * some callers also want the two free scalars. Same two-pass
    * shape as Queries.centsCumHist, generalized: checkpoint the
    * histogram (RangePartitioning samples its child, then shuffles
    * it — unmaterialized, the aggregation would run twice), range-
    * exchange + in-partition sort on the value, collect the 32
    * per-partition count totals, broadcast the scan offsets back.
    * Returns (v | cnt | cum_excl frame, Σcnt, #distinct values).
    */
  def rangeCumHist(s: SparkSession, hist: DataFrame, vCol: String,
      cntCol: String): (DataFrame, Long, Long) = {
    import s.implicits._
    val ds = hist
      .select(col(vCol).cast("long"), col(cntCol).cast("long"))
      .as[(Long, Long)]
      .localCheckpoint()
      .repartitionByRange(32, col(vCol))
      .sortWithinPartitions(vCol)
      .localCheckpoint()
    val partStats = ds.mapPartitions { it =>
      var acc = 0L; var rows = 0L
      it.foreach { p => acc += p._2; rows += 1L }
      Iterator((org.apache.spark.TaskContext.getPartitionId(), acc, rows))
    }.collect().sortBy(_._1)
    val offsets = partStats.map(_._2).scanLeft(0L)(_ + _)
    val bc = s.sparkContext.broadcast(offsets)
    val out = ds.mapPartitions { it =>
      var run = bc.value(org.apache.spark.TaskContext.getPartitionId())
      it.map { case (v, c) => val e = run; run += c; (v, c, e) }
    }.toDF(vCol, cntCol, "cum_excl")
    (out, offsets.last, partStats.map(_._3).sum)
  }

  def rangeCumMax(s: SparkSession, df: DataFrame, kCol: String,
      vCol: String): DataFrame = {
    import s.implicits._
    val ds = df.select(col(kCol).cast("long"), col(vCol).cast("long"))
      .as[(Long, Long)]
      .localCheckpoint()
      .repartitionByRange(32, col(kCol))
      .sortWithinPartitions(kCol)
      .localCheckpoint()
    val partMax = ds.mapPartitions { it =>
      var m = Long.MinValue
      it.foreach(p => if (p._2 > m) m = p._2)
      Iterator((org.apache.spark.TaskContext.getPartitionId(), m))
    }.collect().sortBy(_._1).map(_._2)
    val scans = partMax.scanLeft(Long.MinValue)(math.max) // exclusive
    val bc = s.sparkContext.broadcast(scans)
    ds.mapPartitions { it =>
      var run = bc.value(org.apache.spark.TaskContext.getPartitionId())
      it.map { case (k, v) =>
        val e = run
        if (v > run) run = v
        (k, v, if (e == Long.MinValue) None else Some(e))
      }
    }.toDF(kCol, vCol, "prefix")
  }
}
