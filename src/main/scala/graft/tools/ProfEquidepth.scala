package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Floor breakdown for q_equidepth: how much of the wall is the
  * 6M-row scan + 583k-value partial agg (unavoidable), vs the prefix
  * window form (single-partition over the domain frame vs two-level
  * block decomposition). Decides which window shape ships.
  */
object ProfEquidepth {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val spark = graft.Graft.session("graft-prof-eqd")
    def time(tag: String)(f: => Unit): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROF $tag%-28s min=${runs.min}%6.3f s  runs=${runs.map(r => f"$r%.2f").mkString(",")}")
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def h = li.select(round(col("l_extendedprice") * 100).cast("long").as("v"))
      .groupBy("v").agg(count(lit(1)).as("cnt"))
    time("scan only")(li.select("l_extendedprice").count())
    time("scan+groupBy(v)")(h.count())
    time("single-partition window") {
      h.withColumn("cum", sum("cnt").over(Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1))).count()
    }
    time("two-level window") {
      val hh = h.withColumn("grp", call_function("div", col("v"), lit(100000L)))
      val carry = hh.groupBy("grp").agg(sum("cnt").as("gsum"))
        .withColumn("carry", coalesce(sum("gsum").over(Window.orderBy("grp")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("grp", "carry")
      hh.join(broadcast(carry), "grp")
        .withColumn("cum", col("carry") + coalesce(sum("cnt").over(
          Window.partitionBy("grp").orderBy("v")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .count()
    }
    time("full query (shipped)") {
      graft.SparkEntry.queries("q_equidepth")(spark, sfDir).count()
    }
    spark.stop()
  }
}
