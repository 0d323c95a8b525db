package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Range-partitioned EXCLUSIVE prefix maximum over a (key, value)
  * frame with unique keys — the scale-safe replacement for
  * `max(v).over(Window.orderBy(k))`, which executes as ONE partition
  * and, where it appeared (ev_lateness's per-id-block frontier), ran
  * over a frame that TRACKS the corpus (one row per 4096-id block).
  * Same two-pass shape as TextOps.rangeCumHist / Queries.centsCumHist:
  * checkpoint, range-exchange + in-partition sort on the key, collect
  * the 32 per-partition maxima, broadcast the exclusive scan back.
  * `prefix` is null for keys with no predecessor. (Long.MinValue is
  * the internal "none" sentinel — fine for the epoch-second /
  * count-valued frames this serves.)
  */
object Prefix {
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
