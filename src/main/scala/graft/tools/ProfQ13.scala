package graft.tools

import org.apache.spark.sql.functions._

/** Floor breakdown for q13_cust_distribution at sf1: how much of the
  * wall is the orders scan + custkey partial agg (unavoidable), the
  * customer left join, the histogram agg, and the final orderBy —
  * and whether a join-free union-weights form beats the pre-agg join.
  */
object ProfQ13 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val spark = graft.Graft.session("graft-prof-q13")
    def time(tag: String)(f: => Unit): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROF $tag%-34s min=${runs.min}%6.3f s  runs=${runs.map(r => f"$r%.2f").mkString(",")}")
    }
    val orders = graft.Tables.orders(spark, sfDir)
    val customer = graft.Tables.customer(spark, sfDir)
    time("orders scan (custkey col)")(orders.select("o_custkey").count())
    val ordCnt = orders.groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
    time("orders→custkey agg")(ordCnt.count())
    val joined = customer.select(col("c_custkey"))
      .join(ordCnt, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("n"), lit(0L)).as("c_count"))
    time("…+ customer left join")(joined.count())
    val hist = joined.groupBy("c_count").agg(count(lit(1)).as("custdist"))
    time("…+ histogram agg")(hist.count())
    time("…+ orderBy (full q13)")(
      hist.orderBy(col("custdist").desc, col("c_count").desc).count())
    // join-free: union customers as weight-0 rows, one agg chain
    time("union-weights form") {
      orders.select(col("o_custkey").as("k"), lit(1L).as("w"))
        .unionByName(customer.select(col("c_custkey").as("k"), lit(0L).as("w")))
        .groupBy("k").agg(sum("w").as("c_count"))
        .groupBy("c_count").agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc).count()
    }
    spark.stop()
  }
}
