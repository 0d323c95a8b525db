package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (temporal) join: for every left row, attach the latest right
  * row with the same key and ordering value <= the left's — the
  * canonical event-enrichment operator ("state as of event time")
  * that Spark has no native operator for.
  *
  * Implementation is the union-tag trick, NOT a range join: both
  * sides are tagged and unioned, then a single window per key ordered
  * by (ord, side) carries the last right value forward with
  * last_value(ignoreNulls). One shuffle on the key — same cost as a
  * regular join — versus a naive inequality join's quadratic blowup.
  * This is the (a)-tier answer from SURVEY.md §4: compose existing
  * operators when semantics allow.
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     reference side (its `valueCols` are attached)
    * @param key       equi-join key column name (both sides)
    * @param ord       ordering column name (both sides, e.g. an id or
    *                  epoch; must be totally ordered per key)
    * @param valueCols right-side columns to carry (renamed as given)
    */
  def lastBefore(left: DataFrame, right: DataFrame, key: String, ord: String,
      valueCols: Seq[String], strict: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left.withColumn("_side", lit(1))
    // strict: right row must be strictly earlier (ord < left.ord) —
    // side 0 sorts before side 1 at equal ord, so non-strict is the
    // default; strict demotes ties by nudging right rows after left.
    val sideVal = if (strict) 2 else 0
    val r = right.select((key +: ord +: valueCols).map(col): _*)
      .toDF(Seq(key, ord) ++ valueCols.map("_r_" + _): _*)
      .withColumn("_side", lit(sideVal))
    val unioned = l.drop(valueCols.map("_r_" + _): _*)
      .select((leftCols.map(col) :+ col("_side")) ++ valueCols.map(c => lit(null).cast(r.schema("_r_" + c).dataType).as("_r_" + c)): _*)
      .unionByName(
        r.select((Seq(col(key), col(ord), col("_side")) ++
          leftCols.filterNot(Seq(key, ord).contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          valueCols.map(c => col("_r_" + c))): _*),
        allowMissingColumns = false)
    val w = Window.partitionBy(key).orderBy(col(ord).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn("asof_" + c, last(col("_r_" + c), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1)
      .select((leftCols ++ valueCols.map("asof_" + _)).map(col): _*)
  }
}
