package graft.tools

import org.apache.spark.sql.functions._

/** r15 scratch profiler (r14 verdict item 8): q_merge_upsert was the
  * worst STRESS growth row at 2.34x wall for 10x data — which stage
  * grows? The query is four stages: the customer snapshot scan, the
  * orders change-batch aggregation, the change-batch explode (in-place
  * + offset-insert rows off one agg), and the FULL OUTER merge join +
  * action rollup. Each prefix is timed cumulatively at the given SF
  * dir; run at two decades and diff the deltas.
  */
object ProfMerge {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf1")
    val spark = graft.Graft.session("prof-merge")
    graft.functions.GraftFunctions.register(spark)
    Seq("customer", "orders").foreach { t =>
      spark.read.parquet(s"$d/$t.parquet").count()
    }

    def time(label: String)(f: => Long): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"PROF $label%-28s ${runs.map(_._1).min}%7.3f s  rows=${runs.head._2}")
    }

    val cents = (c: org.apache.spark.sql.Column) =>
      round(c * 100).cast("long")
    val cust = graft.Tables.customer(spark, d).select(col("c_custkey"),
      cents(col("c_acctbal")).as("bal"))
    time("cust_scan")(cust.count())

    val base = graft.Tables.orders(spark, d)
      .groupBy(col("o_custkey").as("k"))
      .agg(sum(cents(col("o_totalprice"))).as("spend"))
    time("orders_agg")(base.count())

    val maxKey = cust.agg(max("c_custkey").as("mx"))
    val chg = base.crossJoin(broadcast(maxKey))
      .select(explode(array_compact(array(
        struct(col("k"), col("spend"),
          when(col("k") % 97L === 0L, lit("D")).otherwise(lit("U")).as("op")),
        when(col("k") % 50L === 0L,
          struct((col("k") + col("mx")).as("k"), col("spend"),
            lit("U").as("op")))))).as("e"))
      .select(col("e.k").as("k"), col("e.spend").as("spend"), col("e.op").as("op"))
    time("chg_batch")(chg.count())

    val merged = cust.join(chg, col("c_custkey") === col("k"), "full_outer")
    time("full_outer_join")(merged.count())

    val report = merged
      .select(
        when(col("c_custkey").isNull, lit("insert"))
          .when(col("k").isNull, lit("unchanged"))
          .when(col("op") === "D", lit("delete"))
          .otherwise(lit("update")).as("action"),
        when(col("c_custkey").isNull, col("spend"))
          .when(col("k").isNull || col("op") === "D", col("bal"))
          .otherwise(col("spend")).as("bal_cents"))
      .groupBy("action")
      .agg(count(lit(1)).as("n_rows"), sum("bal_cents").as("sum_bal_cents"))
    time("full_query")(report.count())

    // the end-to-end graded form, for the job-floor comparison
    time("graded_entry")(
      graft.SparkEntry.queries("q_merge_upsert")(spark, d).count())
    spark.stop()
  }
}
