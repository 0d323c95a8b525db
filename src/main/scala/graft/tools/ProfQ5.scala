package graft.tools

/** r17 scratch (verdict item 1): where does q5's sf1 wall go, and does
  * the replica parquet layout matter? Interleaves the same query over
  * several layout variants of the same data inside ONE JVM so JIT
  * warmup, page cache, and box load hit every variant equally —
  * cross-JVM min-of-2 comparisons were swinging 50% under load.
  *
  * Usage: runMain graft.tools.ProfQ5 <dirA>[,<dirB>,...] [q1,q2,...]
  */
object ProfQ5 {
  def main(args: Array[String]): Unit = {
    val dirs = args.headOption.getOrElse("/tmp/sf1").split(",").toSeq
    val names = args.lift(1).getOrElse(
      "q5_supplier_volume,q3_top_orders,q18_large_orders,q8_market_share")
      .split(",").toSeq
    val spark = graft.Graft.session("prof-q5")
    for (d <- dirs; t <- Seq("lineitem", "orders", "customer", "part", "supplier"))
      spark.read.parquet(s"$d/$t.parquet").count()

    val rounds = 4
    val walls = collection.mutable.Map.empty[(String, String), List[Double]]
        .withDefaultValue(Nil)
    for (r <- 1 to rounds; name <- names; d <- dirs) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, d).count()
      val w = (System.nanoTime() - t0) / 1e9
      walls((name, d)) = w :: walls((name, d))
    }
    for (name <- names; d <- dirs) {
      val ws = walls((name, d))
      println(f"PROF $name%-24s ${d}%-12s min=${ws.min}%6.3f  med=${ws.sorted.apply(ws.size / 2)}%6.3f")
    }

    // component breakdown on the first dir: which slice of q5 owns the wall
    import org.apache.spark.sql.functions._
    val d = dirs.head
    def time(label: String)(f: => Long): Unit = {
      val ws = (1 to 4).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"BREAK $label%-28s min=${ws.min}%6.3f med=${ws.sorted.apply(ws.size / 2)}%6.3f")
    }
    val li = graft.Tables.lineitem(spark, d)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val ord = graft.Tables.orders(spark, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    time("li_scan")(li.count())
    time("ord_scan")(ord.count())
    time("fact_join")(li.join(ord.hint("shuffle_hash"),
      col("l_orderkey") === col("o_orderkey")).count())
    time("fact_join_agg")(li.join(ord.hint("shuffle_hash"),
      col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_suppkey").agg(sum("l_extendedprice")).count())
    time("bcast_customer")(li.limit(1).join(
      broadcast(graft.Tables.customer(spark, d)), lit(true), "cross").count())
    time("full_q5")(graft.SparkEntry.queries("q5_supplier_volume")(spark, d).count())

    // variant: v computed below the shuffle (8B vs 16B/row), customer
    // broadcast folded into the SMALL (date-filtered orders) side so the
    // post-shuffle probes touch c_nationkey directly, and the
    // supplier⋈nation⋈region dim pre-joined into one broadcast.
    def cents(c: org.apache.spark.sql.Column) = round(c * 100).cast("long")
    val liV = graft.Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_suppkey"),
        (cents(col("l_extendedprice")) * cents(lit(1) - col("l_discount"))).as("v"))
    val ordC = ord.join(broadcast(graft.Tables.customer(spark, d)
        .select("c_custkey", "c_nationkey")), col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_nationkey")
    val supDim = graft.Tables.supplier(spark, d).select("s_suppkey", "s_nationkey")
      .join(graft.Tables.nation(spark, d), col("s_nationkey") === col("n_nationkey"))
      .join(graft.Tables.region(spark, d), col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_nationkey", "n_name", "r_name")
    val alt = liV.join(ordC.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supDim),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .groupBy("r_name", "n_name")
      .agg(round(sum(col("v")) / 1e4, 2).as("revenue"), count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
    time("alt_q5")(alt.count())
    spark.stop()
  }
}
