package graft.tools

import org.apache.spark.TaskContext
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window

/** r13 retry of the B41/B52 SinglePartition-prefix-sum floor (r12
  * verdict item 4): the range-partitioned prefix sum — RangePartition
  * on v, per-partition running sums, tiny per-partition totals
  * collected and broadcast as offsets — measured against the shipped
  * single-window shape at sf1 AND 10x, through the FULL q_equidepth
  * downstream so scheduling overhead lands on both sides equally.
  */
object ProfPrefixSum {
  /** shipped shape: one SinglePartition window over the distinct-cents frame */
  def cumSingle(s: SparkSession, d: String): DataFrame = {
    val h = graft.Tables.lineitem(s, d)
      .select(graft.analytics.Queries.cents(col("l_extendedprice")).as("v"))
      .groupBy("v").agg(count(lit(1)).as("cnt"))
    val tot = h.agg(sum("cnt").as("total"))
    h.crossJoin(broadcast(tot))
      .withColumn("cum_excl", coalesce(sum("cnt").over(Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
  }

  /** retry shape (SHIPPED as Queries.centsCumHist after winning both
    * decades): range partition + per-partition sums + offset broadcast */
  def cumRange(s: SparkSession, d: String): DataFrame =
    graft.analytics.Queries.centsCumHist(s, d)

  def equidepth(cum: DataFrame): DataFrame =
    cum.withColumn("bucket",
        call_function("div", col("cum_excl") * 8L, col("total")).cast("int"))
      .groupBy("bucket")
      .agg((min("v") / 100.0).as("lo"), (max("v") / 100.0).as("hi"),
        sum("cnt").as("n_rows"), count(lit(1)).as("n_values"))
      .orderBy("bucket")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val spark = graft.Graft.session("prof-prefix")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    def time(label: String)(f: => Array[org.apache.spark.sql.Row]): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val r = f; ((System.nanoTime() - t0) / 1e9, r.length)
      }
      println(f"PROF $label%-18s min=${runs.map(_._1).min}%7.3f s  rows=${runs.head._2}")
    }
    time("single_window") {
      equidepth(cumSingle(spark, sfDir).withColumnRenamed("total", "total")).collect()
    }
    time("range_prefix") { equidepth(cumRange(spark, sfDir)).collect() }
    // cross-check the two shapes agree
    val a = equidepth(cumSingle(spark, sfDir)).collect().map(_.toString).toSeq
    val b = equidepth(cumRange(spark, sfDir)).collect().map(_.toString).toSeq
    println(s"PROF agree=${a == b}")
    spark.stop()
  }
}
