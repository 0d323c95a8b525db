package graft.tools

import org.apache.spark.sql.functions._

/** r14 scratch: can q7's lineitem-orders shuffle join become a
  * broadcast of the pruned orders projection? Usage: ProfQ7 <sfDir> */
object ProfQ7 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf1")
    val spark = graft.Graft.session("prof-q7")
    Seq("lineitem", "orders").foreach(t => spark.read.parquet(s"$d/$t.parquet").count())

    def time(label: String)(f: => Long): Unit = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"PROF $label%-24s ${runs.map(_._1).min}%7.3f s  rows=${runs.head._2}")
    }
    time("current")(graft.SparkEntry.queries("q7_nation_volume")(spark, d).count())

    val supNation = broadcast(graft.Tables.supplier(spark, d)
      .join(broadcast(graft.Tables.nation(spark, d)), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation")))
    val custNation = broadcast(graft.Tables.customer(spark, d)
      .join(broadcast(graft.Tables.nation(spark, d)), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation")))
    val ordersProj = broadcast(graft.Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_custkey")))
    def cents(c: org.apache.spark.sql.Column) =
      round(c * 100).cast("long")
    val alt = graft.Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_suppkey"),
        (cents(col("l_extendedprice")) * cents(lit(1) - col("l_discount"))).as("v"))
      .join(ordersProj, col("l_orderkey") === col("o_orderkey"))
      .join(supNation, col("l_suppkey") === col("s_suppkey"))
      .join(custNation, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") < col("cust_nation"))
      .groupBy("supp_nation", "cust_nation")
      .agg(round(sum(col("v")) / 1e4, 2).as("volume"), count(lit(1)).as("n_items"))
      .filter(col("n_items") >= 20)
    time("broadcast_orders")(alt.count())
    spark.stop()
  }
}
