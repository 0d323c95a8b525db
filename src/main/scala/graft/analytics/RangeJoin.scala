package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable range (interval) join: match left rows whose point
  * `pointCol` falls inside right rows' `[startCol, endCol)` intervals.
  *
  * Spark has no native range-join operator — a naive
  * `left.join(right, point >= start && point < end)` plans as
  * BroadcastNestedLoopJoin (O(|L|·|R|) comparisons, a cluster-killer
  * the moment the intervals side outgrows a broadcast). The standard
  * scalable form (the same trick Databricks' range-join optimization
  * and every spatial engine use) buckets time into fixed grid cells:
  * each interval EXPLODES into the cells it covers, each point maps to
  * its ONE cell, the join becomes an equi-join on the cell id, and the
  * exact containment predicate filters within matched cells. Each
  * (point, interval) pair can only meet in the point's single cell, so
  * no dedup is needed. Shuffle volume: |L| + Σ interval_span/grid
  * cells — both sides hash-partition by cell, no nested loop anywhere.
  *
  * Grid sizing: cells ≈ the typical interval length. Too fine → the
  * intervals side explodes into many cells; too coarse → many
  * false-candidate pairs filtered after the join. Either way the plan
  * stays an equi-join; only constants move.
  */
object RangeJoin {

  /** @param left      point-side frame
    * @param right     interval-side frame (start inclusive, end exclusive)
    * @param pointCol  left LONG column (e.g. epoch seconds)
    * @param startCol  right LONG column, inclusive
    * @param endCol    right LONG column, exclusive
    * @param grid      cell width in the point column's units
    * @return left ⋈ right rows with exact containment; all columns of
    *         both sides (the internal cell key is dropped)
    */
  def pointInInterval(left: DataFrame, right: DataFrame,
      pointCol: Column, startCol: Column, endCol: Column,
      grid: Long): DataFrame = {
    require(grid > 0, "grid must be positive")
    val cells = right.withColumn("__cell",
      explode(sequence(call_function("div", startCol, lit(grid)),
        call_function("div", endCol - 1L, lit(grid)))))
    val points = left.withColumn("__cell", call_function("div", pointCol, lit(grid)))
    points.join(cells, "__cell")
      .filter(pointCol >= startCol && pointCol < endCol)
      .drop("__cell")
  }
}
