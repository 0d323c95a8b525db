package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** OLAP query backbone (SURVEY.md §2.B) over the TPC-H-ish tables.
  *
  * Conventions for DuckDB-oracle hash parity:
  *   - every computed column aliased identically in Spark and SQL
  *   - doubles rounded (2dp money, 4dp ratios/stats) on both sides
  *   - deterministic total ordering on both sides (ties broken by keys)
  *   - timestamps only ever emitted as DATE or epoch-second BIGINT
  *
  * Scale notes: dimension tables (region/nation/supplier/part/customer
  * at TPC-H ratios) are broadcast explicitly; fact-fact joins shuffle on
  * their keys and rely on AQE for skew; aggregates use partial
  * (map-side) aggregation automatically via groupBy.
  */
object Queries {

  type QFn = (SparkSession, String) => DataFrame

  /** Exact-cents kernel for DuckDB-parity money aggregates: 2-decimal
    * inputs become exact int64 "cents", whose sums are order-
    * insensitive (unlike double sums, where partial-agg order differs
    * between engines and can flip a round() half-boundary — observed
    * on avg(o_totalprice) at sf0.001). Division back to currency then
    * happens on identical operands in both engines.
    */
  def cents(c: Column): Column = round(c * 100).cast("long")

  def exactAvg(c: Column, scale: Int): Column =
    round(sum(cents(c)) / (count(c) * 100.0), scale)

  /** Exact 2dp currency from a 1e4-unit int64 amount. The half-boundary
    * is decided by integer floor((x*2+100)/200) — identical in both
    * engines — instead of round(double, 2), whose HALF_UP (Spark
    * BigDecimal) vs binary-value (DuckDB) conventions diverge on
    * amounts ending in 50 1e-4-units (observed: 2183640.655 → .66 vs
    * .65 at sf0.1). Floor keeps negatives consistent too (DuckDB int
    * division truncates toward zero; double floor does not).
    */
  def money2(amount1e4: Column): Column =
    floor((amount1e4 * 2 + 100) / 200).cast("long") / 100.0

  /** Shared exclusive-prefix-summed cents histogram for B41/B52
    * (q_equidepth, q_percentile_cont): (v, cnt, cum_excl, total) over
    * the DISTINCT l_extendedprice cents domain (bounded by the price
    * grid — qty 1-50 × part price values — 583 k rows at sf1,
    * corpus-independent). r13 replan of the r11 SinglePartition
    * window: RANGE-partition the domain on v, per-partition running
    * sums, and a 32-long per-partition-total frame collected +
    * broadcast as offsets — the classic distributed prefix sum.
    * Measured (ProfPrefixSum, full q_equidepth downstream): sf1
    * 1.15 s vs 1.54 s single-window, 10× data 2.09 s vs 3.24 s —
    * wins at both decades and the gap WIDENS with scale (the r11
    * two-level block attempt lost because it kept everything in
    * exchanges; the collect here is 32 longs, driver-bounded).
    * localCheckpoint (not persist) so the frame materializes once per
    * execution without a plan-keyed CacheManager entry; eager, so the
    * offsets collect below reads checkpointed blocks, not a recompute.
    */
  def centsCumHist(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // checkpoint the agg BEFORE the range exchange: RangePartitioning
    // samples its child and then shuffles it, so an un-materialized
    // child would run the corpus aggregation twice; the second
    // checkpoint materializes the sorted ranges so the offsets pass
    // and the final prefix pass both read blocks, not a re-shuffle.
    val ds = Tables.lineitem(s, d)
      .select(cents(col("l_extendedprice")).as("v"))
      .groupBy("v").agg(count(lit(1)).as("cnt"))
      .select(col("v").cast("long"), col("cnt").cast("long"))
      .as[(Long, Long)]
      .localCheckpoint()
      .repartitionByRange(32, col("v"))
      .sortWithinPartitions("v")
      .localCheckpoint()
    val partTotals = ds.mapPartitions { it =>
      var acc = 0L; it.foreach(acc += _._2)
      Iterator((org.apache.spark.TaskContext.getPartitionId(), acc))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partTotals.scanLeft(0L)(_ + _)
    val total = offsets.last
    val bc = s.sparkContext.broadcast(offsets)
    ds.mapPartitions { it =>
      var run = bc.value(org.apache.spark.TaskContext.getPartitionId())
      it.map { case (v, c) => val e = run; run += c; (v, c, e) }
    }.toDF("v", "cnt", "cum_excl").withColumn("total", lit(total))
  }

  /** (name, dataframe impl, oracle SQL). */
  val entries: Seq[(String, QFn, Option[String])] = Seq(

    // B1: grouped aggregation with partial agg (TPC-H Q1 flavor).
    ("q1_pricing_summary", (s: SparkSession, d: String) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1999-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          // l_quantity is integer-valued → double sum exact; prices
          // are 2dp → exact-int64-cents (SURVEY §6 money hygiene)
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum(cents(col("l_extendedprice"))) / 100.0, 2).as("sum_base_price"),
          round(sum(cents(col("l_extendedprice")) * cents(lit(1) - col("l_discount"))) / 1e4, 2).as("sum_disc_price"),
          round(sum(cents(col("l_extendedprice")) * cents(lit(1) - col("l_discount")) * cents(lit(1) + col("l_tax"))) / 1e6, 2).as("sum_charge"),
          exactAvg(col("l_quantity"), 4).as("avg_qty"),
          exactAvg(col("l_extendedprice"), 4).as("avg_price"),
          exactAvg(col("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }, Some("""
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0, 2) AS sum_base_price,
             round(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round((1 - l_discount) * 100) AS BIGINT)) / 1e4, 2) AS sum_disc_price,
             round(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round((1 - l_discount) * 100) AS BIGINT) * CAST(round((1 + l_tax) * 100) AS BIGINT)) / 1e6, 2) AS sum_charge,
             round(sum(CAST(round(l_quantity * 100) AS BIGINT)) / (count(*) * 100.0), 4) AS avg_qty,
             round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / (count(*) * 100.0), 4) AS avg_price,
             round(sum(CAST(round(l_discount * 100) AS BIGINT)) / (count(*) * 100.0), 4) AS avg_disc,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1999-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")),

    // B2: tight filtered scan; predicate + projection pushdown to parquet.
    ("q6_revenue_filter", (s: SparkSession, d: String) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                col("l_shipdate") <  lit("1997-01-01").cast("timestamp") &&
                col("l_discount") >= 0.0199 && col("l_discount") <= 0.0401 &&
                col("l_quantity") < 24)
        .agg(round(sum(cents(col("l_extendedprice")) * cents(col("l_discount"))) / 1e4, 2).as("revenue"),
             count(lit(1)).as("n_rows"))
    }, Some("""
      SELECT round(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round(l_discount * 100) AS BIGINT)) / 1e4, 2) AS revenue,
             count(*) AS n_rows
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount >= 0.0199 AND l_discount <= 0.0401 AND l_quantity < 24""")),

    // B3: broadcast dimension join chain customer -> nation -> region.
    ("q_cust_region", (s: SparkSession, d: String) => {
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_customers"),
             exactAvg(col("c_acctbal"), 4).as("avg_acctbal"))
        .orderBy("r_name")
    }, Some("""
      SELECT r_name, count(*) AS n_customers,
             round(sum(CAST(round(c_acctbal * 100) AS BIGINT)) / (count(*) * 100.0), 4) AS avg_acctbal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name""")),

    // B4: fact-fact shuffle join + agg + deterministic top-k (TPC-H Q3 flavor).
    // r17 replan (ProfQ5 methodology): customer's segment filter folds
    // into the orders side BEFORE the fact shuffle — only ~1/5 of
    // orders cross the exchange and the post-shuffle broadcast probe
    // disappears — and the revenue product collapses to one long below
    // the shuffle (8 B/row instead of two doubles).
    ("q3_top_orders", (s: SparkSession, d: String) => {
      val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .join(broadcast(cust.select("c_custkey")), col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") > lit("1996-06-30").cast("timestamp"))
        .select(col("l_orderkey"),
          (cents(col("l_extendedprice")) * cents(lit(1) - col("l_discount"))).as("v"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("o_date"), col("o_orderpriority"))
        .agg(round(sum(col("v")) / 1e4, 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }, Some("""
      SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_date, o_orderpriority,
             round(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round((1 - l_discount) * 100) AS BIGINT)) / 1e4, 2) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01'
        AND l_shipdate > TIMESTAMP '1996-06-30'
      GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
      ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""")),

    // B5: 5-way multijoin (TPC-H Q5 flavor; local-supplier constraint).
    // r17 replan (ProfQ5, min-of-4 in-JVM at sf1: 1.49 s → 0.96 s):
    //  - the revenue product collapses to ONE long ("v") BELOW the fact
    //    shuffle, so the exchange carries 8 bytes instead of two doubles
    //    and the post-join side multiplies nothing;
    //  - customer folds into the SMALL (date-filtered orders) side
    //    before the shuffle — the broadcast probe runs over ~30% of
    //    orders instead of every joined lineitem row, and only
    //    c_nationkey crosses the exchange;
    //  - supplier⋈nation⋈region pre-reduce to one 4-column broadcast.
    // The fact-fact edge stays a shuffle (shuffle-hash, not SMJ:
    // neither side's sort order is reused downstream) — orders at
    // 100 TB is not broadcastable and this is the scale-correct shape.
    ("q5_supplier_volume", (s: SparkSession, d: String) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"),
          (cents(col("l_extendedprice")) * cents(lit(1) - col("l_discount"))).as("v"))
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .join(broadcast(Tables.customer(s, d).select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_nationkey")
      val supDim = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
        .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
        .select("s_suppkey", "s_nationkey", "n_name", "r_name")
      li.join(ord.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supDim),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .groupBy("r_name", "n_name")
        .agg(round(sum(col("v")) / 1e4, 2).as("revenue"),
             count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    }, Some("""
      SELECT r_name, n_name,
             round(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round((1 - l_discount) * 100) AS BIGINT)) / 1e4, 2) AS revenue,
             count(*) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
                    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                    JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY r_name, n_name ORDER BY r_name, n_name""")),

    // B6: semi-join / EXISTS (TPC-H Q4 flavor).
    ("q4_order_priority", (s: SparkSession, d: String) => {
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
      val late = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
      ord.join(late, col("o_orderkey") === col("l_orderkey") &&
                     col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }, Some("""
      SELECT o_orderpriority, count(*) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // B7: anti-join — customers with no orders in a window.
    ("q_anti_customers", (s: SparkSession, d: String) => {
      val active = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
        .select("o_custkey")
      Tables.customer(s, d)
        .join(active, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_inactive"),
             round(sum(cents(col("c_acctbal"))) / 100.0, 2).as("tot_acctbal"))
        .orderBy("c_mktsegment")
    }, Some("""
      SELECT c_mktsegment, count(*) AS n_inactive,
             round(sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0, 2) AS tot_acctbal
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '1995-01-01'
                          AND o_orderdate < TIMESTAMP '1996-01-01')
      GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // B8: window top-k per group (row_number for deterministic ties).
    ("q_topk_per_cust", (s: SparkSession, d: String) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .filter(col("o_custkey") < 50)
        .select(col("o_custkey"), col("rk"), col("o_orderkey"),
                round(col("o_totalprice"), 2).as("totalprice"))
        .orderBy("o_custkey", "rk")
    }, Some("""
      SELECT o_custkey, CAST(rk AS INTEGER) AS rk, o_orderkey, round(o_totalprice, 2) AS totalprice
      FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
            FROM orders) t
      WHERE rk <= 3 AND o_custkey < 50
      ORDER BY o_custkey, rk""")),

    // B9: running total over bounded (monthly) dimension — window after
    // pre-aggregation so the unpartitioned frame is tiny, never the fact table.
    ("q_running_total", (s: SparkSession, d: String) => {
      // monthly totals AND the running sum accumulate in exact int64
      // cents; doubles appear only at the final 2dp presentation
      val monthly = Tables.orders(s, d)
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
        .agg(sum(cents(col("o_totalprice"))).as("month_c"))
      val w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, Window.currentRow)
      monthly.withColumn("cum_rev", round(sum("month_c").over(w) / 100.0, 2))
        .withColumn("month_rev", round(col("month_c") / 100.0, 2))
        .select("month", "month_rev", "cum_rev")
        .orderBy("month")
    }, Some("""
      SELECT month, round(month_c / 100.0, 2) AS month_rev,
             round(sum(month_c) OVER (ORDER BY month
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0, 2) AS cum_rev
      FROM (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
                   sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS month_c
            FROM orders GROUP BY 1) t
      ORDER BY month""")),

    // B10: ROLLUP multi-level aggregate.
    ("q_rollup_returns", (s: SparkSession, d: String) => {
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n_rows"), round(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }, Some("""
      SELECT l_returnflag, l_linestatus, count(*) AS n_rows, round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    // B10b: explicit GROUPING SETS — the grouping construct CUBE (B19)
    // and ROLLUP (B10) cannot express: two independent 1-key marginals
    // in one pass, no combined cell. Dataset.groupingSets (Spark 4)
    // plans it as the same Expand each other grouping op uses — one
    // scan, partial-agged; grouping_id disambiguates the NULL key
    // rows exactly as in the cube/rollup tier. Money in exact int64
    // cents (the cents helper), one trailing division.
    ("q_grouping_sets", (s: SparkSession, d: String) => {
      Tables.lineitem(s, d)
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n_rows"),
          round(sum(cents(col("l_extendedprice"))) / 100.0, 2).as("sum_price"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }, Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
             count(*) AS n_rows,
             round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0, 2) AS sum_price
      FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
      ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    // B11: exact distinct aggregation.
    ("q_distinct_parts", (s: SparkSession, d: String) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(countDistinct("l_partkey").as("n_parts"),
             countDistinct("l_suppkey").as("n_supps"),
             count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    }, Some("""
      SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
             count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // B12: exact percentiles (linear interpolation both engines).
    ("q_price_percentiles", (s: SparkSession, d: String) => {
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(round(expr("percentile(o_totalprice, 0.25)"), 4).as("p25"),
             round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
             round(expr("percentile(o_totalprice, 0.75)"), 4).as("p75"),
             round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"))
        .orderBy("o_orderstatus")
    }, Some("""
      SELECT o_orderstatus,
             round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
             round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
             round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
             round(quantile_cont(o_totalprice, 0.9), 4) AS p90
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // B13: pivot-style conditional aggregation.
    ("q_status_pivot", (s: SparkSession, d: String) => {
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_open"),
             sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_filled"),
             sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).as("n_partial"))
        .orderBy("o_orderpriority")
    }, Some("""
      SELECT o_orderpriority,
             CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
             CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
             CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_partial
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // B14: scalar-subquery comparison via broadcast single-row join.
    ("q_above_avg_balance", (s: SparkSession, d: String) => {
      val cust = Tables.customer(s, d)
      val globalAvg = cust.agg(avg("c_acctbal").as("global_avg"))
      cust.crossJoin(broadcast(globalAvg))
        .filter(col("c_acctbal") > col("global_avg"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_rich"), exactAvg(col("c_acctbal"), 4).as("avg_bal"))
        .orderBy("n_name")
    }, Some("""
      SELECT n_name, count(*) AS n_rich,
             round(sum(CAST(round(c_acctbal * 100) AS BIGINT)) / (count(*) * 100.0), 4) AS avg_bal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
      GROUP BY n_name ORDER BY n_name""")),

    // B15: statistical aggregates.
    ("q_stats_lineitem", (s: SparkSession, d: String) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(round(stddev_samp("l_quantity"), 4).as("sd_qty"),
             round(var_samp("l_extendedprice"), 2).as("var_price"),
             round(corr("l_quantity", "l_extendedprice"), 4).as("corr_qty_price"),
             round(covar_samp("l_quantity", "l_discount"), 4).as("cov_qty_disc"))
        .orderBy("l_returnflag")
    }, Some("""
      SELECT l_returnflag,
             round(stddev_samp(l_quantity), 4) AS sd_qty,
             round(var_samp(l_extendedprice), 2) AS var_price,
             round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
             round(covar_samp(l_quantity, l_discount), 4) AS cov_qty_disc
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // B17: LIKE filter + conditional-aggregate ratio (TPC-H Q14 flavor).
    ("q_promo_share", (s: SparkSession, d: String) => {
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .agg((lit(100.0) *
            sum(when(col("p_type").like("PROMO%"), cents(col("l_extendedprice")) * cents(lit(1) - col("l_discount"))).otherwise(0L)) /
            sum(cents(col("l_extendedprice")) * cents(lit(1) - col("l_discount")))).as("raw"))
        .select(round(col("raw"), 4).as("promo_share_pct"))
    }, Some("""
      SELECT round(100.0 *
               sum(CASE WHEN p_type LIKE 'PROMO%'
                        THEN CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round((1 - l_discount) * 100) AS BIGINT)
                        ELSE 0 END)
               / sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round((1 - l_discount) * 100) AS BIGINT)), 4) AS promo_share_pct
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'""")),

    // B18: argmin per group (correlated-subquery equivalent, TPC-H Q2
    // flavor): cheapest supplier per part via a window, not a per-row
    // subquery — one shuffle instead of N lookups.
    ("q_min_cost_supplier", (s: SparkSession, d: String) => {
      val w = Window.partitionBy("l_partkey").orderBy(col("cost").asc, col("l_suppkey").asc)
      Tables.lineitem(s, d)
        .groupBy("l_partkey", "l_suppkey")
        .agg(round(avg(col("l_extendedprice") / col("l_quantity")), 4).as("cost"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("l_partkey") < 50)
        .select(col("l_partkey"), col("l_suppkey").as("cheapest_supp"), col("cost"))
        .orderBy("l_partkey")
    }, Some("""
      SELECT l_partkey, cheapest_supp, cost FROM (
        SELECT l_partkey, l_suppkey AS cheapest_supp, cost,
               row_number() OVER (PARTITION BY l_partkey
                 ORDER BY cost ASC, l_suppkey ASC) AS rn
        FROM (SELECT l_partkey, l_suppkey,
                     round(avg(l_extendedprice / l_quantity), 4) AS cost
              FROM lineitem GROUP BY l_partkey, l_suppkey) c) t
      WHERE rn = 1 AND l_partkey < 50 ORDER BY l_partkey""")),

    // B19: CUBE over two dimensions.
    ("q_cube_status", (s: SparkSession, d: String) => {
      // exact-int64-cents sum (SURVEY §6 money hygiene): the plain
      // double sum flipped the grand-total row's 2dp half-boundary at
      // sf1 (1.5 M addends, order-sensitive last-ulp drift)
      Tables.orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          round(sum(cents(col("o_totalprice"))) / 100.0, 2).as("tot"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    }, Some("""
      SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2) AS tot
      FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")),

    // B25: nation-pair trade volume (TPC-H Q7 flavor) — two different
    // dimension roles (supplier nation vs customer nation) off one
    // fact scan, both broadcast.
    ("q7_nation_volume", (s: SparkSession, d: String) => {
      val supNation = broadcast(Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation")))
      val custNation = broadcast(Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation")))
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(supNation, col("l_suppkey") === col("s_suppkey"))
        .join(custNation, col("o_custkey") === col("c_custkey"))
        .filter(col("supp_nation") < col("cust_nation"))
        .groupBy("supp_nation", "cust_nation")
        .agg(round(sum(cents(col("l_extendedprice")) * cents(lit(1) - col("l_discount"))) / 1e4, 2).as("volume"),
             count(lit(1)).as("n_items"))
        .filter(col("n_items") >= 20)
        .orderBy("supp_nation", "cust_nation")
    }, Some("""
      -- r14: aggregate on nation PAIRS first, name-filter after — the
      -- WHERE supp_nation < cust_nation form sent DuckDB's planner
      -- superlinear (10 s at sf0.1, >600 s at sf1); this identical-
      -- result shape runs 0.15 s / 0.64 s
      WITH agg AS (
        SELECT sn.n_name AS supp_nation, cn_map.cust_nation,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS vol_e4,
               count(*) AS n_items
        FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation sn ON s_nationkey = sn.n_nationkey
          JOIN (SELECT c_custkey, n_name AS cust_nation
                FROM customer JOIN nation ON c_nationkey = n_nationkey) cn_map
            ON o_custkey = cn_map.c_custkey
        GROUP BY 1, 2)
      SELECT supp_nation, cust_nation, round(vol_e4 / 1e4, 2) AS volume, n_items
      FROM agg
      WHERE supp_nation < cust_nation AND n_items >= 20
      ORDER BY supp_nation, cust_nation""")),

    // B26: shipping-priority split (TPC-H Q12 flavor).
    ("q12_priority_split", (s: SparkSession, d: String) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)).cast("long").as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)).cast("long").as("low_line_count"))
        .orderBy("l_linestatus")
    }, Some("""
      SELECT l_linestatus,
             CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_linestatus ORDER BY l_linestatus""")),

    // B27: customer order-count distribution (TPC-H Q13 flavor) —
    // left join keeps zero-order customers, then a second grouping.
    // Orders are pre-aggregated to (o_custkey, n) BEFORE the customer
    // join (same discipline as the q21 replan): the join's probe side
    // shrinks from |orders| rows to |distinct custkeys| (~10×), and
    // the per-customer count needs no post-join groupBy at all —
    // coalesce(n, 0) IS c_count, so the plan is agg → join → agg
    // instead of wide-join → agg → agg. At 100 TB the orders→custkey
    // partial agg is map-side-combined, so the only full-width shuffle
    // of the fact table disappears.
    ("q13_cust_distribution", (s: SparkSession, d: String) => {
      val ordCnt = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"))
      Tables.customer(s, d).select(col("c_custkey"))
        .join(ordCnt, col("c_custkey") === col("o_custkey"), "left")
        .select(coalesce(col("n"), lit(0L)).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }, Some("""
      SELECT c_count, count(*) AS custdist
      FROM (SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey) t
      GROUP BY c_count ORDER BY custdist DESC, c_count DESC""")),

    // B28: large-volume orders (TPC-H Q18 flavor) — group-having then
    // join the qualifying keys back to the fact.
    ("q18_large_orders", (s: SparkSession, d: String) => {
      val big = Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(round(sum("l_quantity"), 2).as("total_qty"))
        .filter(col("total_qty") > 150)
      big.join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate").cast("date").as("o_date"),
          round(col("o_totalprice"), 2).as("totalprice"), col("total_qty"))
        .orderBy(col("total_qty").desc, col("o_orderkey").asc)
        .limit(50)
    }, Some("""
      SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS o_date,
             round(o_totalprice, 2) AS totalprice, total_qty
      FROM (SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING round(sum(l_quantity), 2) > 150) b
        JOIN orders ON l_orderkey = o_orderkey
      ORDER BY total_qty DESC, o_orderkey ASC LIMIT 50""")),

    // B29: bracketed OR-of-ANDs predicate revenue (TPC-H Q19 flavor).
    // B31 (TPC-H Q17 flavor): revenue share of small-quantity items —
    // a correlated per-part average threshold. The 0.2·avg compare
    // runs EXACTLY as qty·5·cnt < sum_qty (quantities are integral;
    // no double ever decides the boundary), money as int64 cents, and
    // the yearly average is an exact integer division. Per-part stats
    // aggregate first (map-side), then join back — the standard
    // decorrelation, no row ever compares against an un-aggregated
    // subquery.
    ("q17_small_qty", (s: SparkSession, d: String) => {
      val li = Tables.lineitem(s, d).select(col("l_partkey"),
        col("l_quantity").cast("long").as("qty"),
        cents(col("l_extendedprice")).as("px_e2"))
      val stats = li.groupBy("l_partkey")
        .agg(sum("qty").as("sum_qty"), count(lit(1)).as("cnt"))
      li.join(stats, "l_partkey")
        .filter(col("qty") * 5L * col("cnt") < col("sum_qty"))
        .agg(count(lit(1)).as("n_small"),
          sum("px_e2").cast("long").as("total_e2"))
        .withColumn("avg_yearly_e2", call_function("div", col("total_e2"), lit(7L)))
    }, Some("""
      WITH li AS (
        SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS px
        FROM lineitem),
      st AS (SELECT l_partkey, sum(qty) AS sum_qty, count(*) AS cnt
             FROM li GROUP BY l_partkey)
      SELECT count(*) AS n_small,
             CAST(sum(px) AS BIGINT) AS total_e2,
             CAST(sum(px) // 7 AS BIGINT) AS avg_yearly_e2
      FROM li JOIN st USING (l_partkey)
      WHERE qty * 5 * cnt < sum_qty""")),

    // B32 (TPC-H Q21 flavor, adapted to the available columns: "late"
    // = shipped >60 days after the order date): suppliers who were
    // the ONLY late supplier in a multi-supplier order. The EXISTS /
    // NOT-EXISTS formulation decorrelates to per-order GROUP COUNTS —
    // n_suppliers, n_late_suppliers, and (via min on a guarded value)
    // THE late supplier when unique — so the whole query is one
    // distinct + one agg + a broadcast supplier join: no self-join of
    // the fact table ever happens (measured 2.1 s → the agg shape at
    // sf0.1; the oracle keeps the textbook EXISTS form and hashes
    // identically, proving the rewrite).
    ("q21_waiting_supplier", (s: SparkSession, d: String) => {
      // ONE fact-size exchange, not three (r8-r9 sat at 2.1-2.6x sf1
      // with agg->exchange->join->exchange): shuffle-hash join li and
      // orders on orderkey FIRST, then both aggregations reuse the
      // join's HashPartitioning(l_orderkey) — (l_orderkey, l_suppkey)
      // clustering is satisfied by the orderkey partitioning, so
      // neither groupBy adds an exchange. Per-supplier lateness is
      // max(per-line late flag): a supplier is late iff ANY of its
      // lines ships >60d after the order date, so the per-line flag
      // aggregates to the same value as the old max_ship compare.
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"),
        col("l_shipdate"))
      val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate"))
      val perSupp = li.join(ord.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"), 1L)
            .otherwise(0L).as("late_line"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(max("late_line").as("is_late"))
      perSupp.groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_supp"),
          sum("is_late").as("n_late"),
          min(when(col("is_late") === 1L, col("l_suppkey"))).as("late_supp"))
        .filter(col("n_supp") > 1 && col("n_late") === 1)
        .join(broadcast(Tables.supplier(s, d)), col("late_supp") === col("s_suppkey"))
        .groupBy("s_name").agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name").asc)
        .limit(20)
    }, Some("""
      WITH late AS (
        SELECT DISTINCT l_orderkey, l_suppkey
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY),
      others AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
      SELECT s_name, count(*) AS numwait
      FROM late a JOIN supplier ON a.l_suppkey = s_suppkey
      WHERE EXISTS (SELECT 1 FROM others b
                    WHERE b.l_orderkey = a.l_orderkey
                      AND b.l_suppkey <> a.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM late c
                        WHERE c.l_orderkey = a.l_orderkey
                          AND c.l_suppkey <> a.l_suppkey)
      GROUP BY s_name
      ORDER BY numwait DESC, s_name ASC LIMIT 20""")),

    ("q19_bracket_revenue", (s: SparkSession, d: String) => {
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) && col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#7" && col("p_size").between(10, 30) && col("l_quantity").between(10, 35)) ||
          (col("p_brand") === "Brand#13" && col("p_size").between(20, 50) && col("l_quantity").between(20, 50)))
        .agg(round(sum(cents(col("l_extendedprice")) * cents(lit(1) - col("l_discount"))) / 1e4, 2).as("revenue"),
             count(lit(1)).as("n_rows"))
    }, Some("""
      SELECT round(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round((1 - l_discount) * 100) AS BIGINT)) / 1e4, 2) AS revenue,
             count(*) AS n_rows
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
         OR (p_brand = 'Brand#7' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
         OR (p_brand = 'Brand#13' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)""")),

    // B21: ntile bucketing — DISTRIBUTED exact ntile(4), no global
    // single-partition sort. Rows bucket into coarse spend blocks that
    // respect the global order (block = floor(spend/1000), ordered
    // desc); rank = per-block row_number (partitioned window) + the
    // cumulative count of all higher blocks (tiny window over block
    // counts, broadcast back). The quartile then falls out of the SQL
    // ntile size rule in closed form — first N%4 buckets get
    // ceil(N/4) rows — so the result is bit-identical to ntile(4)
    // while every big window is partitioned.
    // B50 (r11): percent_rank / cume_dist — the remaining rank-family
    // windows (B8 rank, B9 running total, B21 ntile already graded) —
    // in EXACT integer form: pr = (rk−1)/(n−1), cd = (rk−1+peers)/n,
    // both as half-up e4 rationals (no engine's float window output is
    // trusted). Windows partition by nationkey (the per-group ranking
    // every real report wants anyway — nothing global); ties share a
    // rank() and a peer count, so the outputs are total-order-stable.
    // Zero-order customers stay in at spend 0 (left join + coalesce).
    ("q_pctrank_custspend", (s: SparkSession, d: String) => {
      val spend = Tables.customer(s, d).select("c_custkey", "c_nationkey")
        .join(Tables.orders(s, d).groupBy("o_custkey")
            .agg(sum(cents(col("o_totalprice"))).as("sp")),
          col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), col("c_nationkey"),
          coalesce(col("sp"), lit(0L)).as("spend_c"))
      val byNation = Window.partitionBy("c_nationkey")
      val rkW = byNation.orderBy(col("spend_c").desc)
      val d4 = (x: Column, y: Column) => call_function("div", x, y)
      spend
        .withColumn("rk", rank().over(rkW).cast("long"))
        .withColumn("n", count(lit(1)).over(byNation))
        .withColumn("peers", count(lit(1)).over(Window.partitionBy("c_nationkey", "spend_c")))
        .withColumn("pr_e4",
          // n=1 partition: percent_rank() is 0 by definition; the
          // rational form's divisor (n-1)*2 would be 0 there (Spark
          // div → NULL, DuckDB // → error), so special-case it.
          when(col("n") === 1L, lit(0L)).otherwise(
            d4((col("rk") - 1L) * 20000L + (col("n") - 1L), (col("n") - 1L) * 2L)))
        .withColumn("cd_e4",
          d4((col("rk") - 1L + col("peers")) * 20000L + col("n"), col("n") * 2L))
        .filter(col("c_custkey") < 200)
        .select("c_custkey", "c_nationkey", "spend_c", "pr_e4", "cd_e4")
        .orderBy("c_custkey")
    }, Some("""
      WITH s AS (
        SELECT c.c_custkey, c.c_nationkey,
               coalesce(o.sp, 0) AS spend_c
        FROM customer c LEFT JOIN (
          SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sp
          FROM orders GROUP BY o_custkey) o ON o.o_custkey = c.c_custkey),
      r AS (
        SELECT c_custkey, c_nationkey, spend_c,
               CAST(rank() OVER (PARTITION BY c_nationkey ORDER BY spend_c DESC) AS BIGINT) AS rk,
               CAST(count(*) OVER (PARTITION BY c_nationkey) AS BIGINT) AS n,
               CAST(count(*) OVER (PARTITION BY c_nationkey, spend_c) AS BIGINT) AS peers
        FROM s)
      SELECT c_custkey, c_nationkey, spend_c,
             CAST(CASE WHEN n = 1 THEN 0
                  ELSE ((rk - 1) * 20000 + (n - 1)) // ((n - 1) * 2) END AS BIGINT) AS pr_e4,
             CAST(((rk - 1 + peers) * 20000 + n) // (n * 2) AS BIGINT) AS cd_e4
      FROM r WHERE c_custkey < 200 ORDER BY c_custkey""")),

    ("q_ntile_custspend", (s: SparkSession, d: String) => {
      val spend = Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(round(sum(cents(col("o_totalprice"))) / 100.0, 2).as("spend"))
        .withColumn("blk", floor(col("spend") / 1000.0).cast("long"))
      val local = Window.partitionBy("blk").orderBy(col("spend").desc, col("o_custkey").asc)
      val offW = Window.orderBy(col("blk").desc).rowsBetween(Window.unboundedPreceding, -1)
      val allW = Window.partitionBy(lit(1)).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val offsets = spend.groupBy("blk").agg(count(lit(1)).as("bn"))
        .withColumn("off", coalesce(sum("bn").over(offW), lit(0L)))
        .withColumn("n_total", sum("bn").over(allW))
        .select("blk", "off", "n_total")
      val d4 = (x: Column, y: Column) => call_function("div", x, y)
      val ranked = spend
        .withColumn("rk", row_number().over(local).cast("long"))
        .join(broadcast(offsets), "blk")
        .withColumn("rank", col("rk") + col("off"))
        .withColumn("small", d4(col("n_total"), lit(4L)))
        .withColumn("r", col("n_total") % 4L)
        .withColumn("cutoff", col("r") * (col("small") + 1L))
        .withColumn("quartile",
          when(col("rank") <= col("cutoff"),
            d4(col("rank") - 1L, col("small") + 1L) + 1L)
          .otherwise(col("r") + d4(col("rank") - col("cutoff") - 1L, col("small")) + 1L)
          .cast("int"))
      ranked.groupBy("quartile")
        .agg(count(lit(1)).as("n_cust"),
          round(sum(cents(col("spend"))) / 100.0, 2).as("tot_spend"))
        .orderBy("quartile")
    }, Some("""
      SELECT CAST(quartile AS INTEGER) AS quartile, count(*) AS n_cust,
             round(sum(CAST(round(spend * 100) AS BIGINT)) / 100.0, 2) AS tot_spend
      FROM (SELECT o_custkey, spend,
                   ntile(4) OVER (ORDER BY spend DESC, o_custkey ASC) AS quartile
            FROM (SELECT o_custkey, round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2) AS spend
                  FROM orders GROUP BY o_custkey) sp) t
      GROUP BY quartile ORDER BY quartile""")),

    // B22: EXCEPT / INTERSECT set operations.
    ("q_set_ops", (s: SparkSession, d: String) => {
      val buyers95 = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
        .select("o_custkey")
      val buyers00 = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
      val churned = buyers95.except(buyers00).agg(count(lit(1)).as("n")).withColumn("seg", lit("churned"))
      val retained = buyers95.intersect(buyers00).agg(count(lit(1)).as("n")).withColumn("seg", lit("retained"))
      churned.unionByName(retained).select("seg", "n").orderBy("seg")
    }, Some("""
      WITH a AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'),
           b AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01')
      SELECT 'churned' AS seg, count(*) AS n FROM (SELECT * FROM a EXCEPT SELECT * FROM b) t
      UNION ALL
      SELECT 'retained' AS seg, count(*) AS n FROM (SELECT * FROM a INTERSECT SELECT * FROM b) t
      ORDER BY seg""")),

    // B23: scalar string-function surface.
    ("q_string_funcs", (s: SparkSession, d: String) => {
      Tables.part(s, d)
        .filter(col("p_partkey") < 50)
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_up"),
          substring(col("p_type"), 1, 3).as("type3"),
          concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
          length(col("p_name")).as("name_len"))
        .orderBy("p_partkey")
    }, Some("""
      SELECT p_partkey, upper(p_brand) AS brand_up, substr(p_type, 1, 3) AS type3,
             concat_ws('-', p_brand, p_type) AS brand_type,
             regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
             CAST(length(p_name) AS INTEGER) AS name_len
      FROM part WHERE p_partkey < 50 ORDER BY p_partkey""")),

    // B24: date-part extraction (year/month/quarter — identical
    // semantics in both engines; dayofweek origins differ, avoided).
    ("q_date_parts", (s: SparkSession, d: String) => {
      Tables.orders(s, d)
        .groupBy(year(col("o_orderdate")).as("yr"), quarter(col("o_orderdate")).as("qtr"))
        .agg(count(lit(1)).as("n"), exactAvg(col("o_totalprice"), 4).as("avg_price"))
        .orderBy("yr", "qtr")
    }, Some("""
      SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
             CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
             count(*) AS n,
             round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / (count(*) * 100.0), 4) AS avg_price
      FROM orders GROUP BY 1, 2 ORDER BY yr, qtr""")),

    // B30: quantity-weighted average price — exact-cents numerator so
    // summation order cannot flip the rounding (§6).
    ("q_weighted_avg_price", (s: SparkSession, d: String) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(round(
          sum(cents(col("l_extendedprice")) * col("l_quantity").cast("long")) /
            (sum(col("l_quantity").cast("long")) * 100.0), 4).as("wavg_price"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    }, Some("""
      SELECT l_returnflag,
             round(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(l_quantity AS BIGINT))
                   / (sum(CAST(l_quantity AS BIGINT)) * 100.0), 4) AS wavg_price,
             count(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // B20: sketch aggregates — HLL distinct + approximate quantiles,
    // graded with a BOUNDED-ERROR oracle (raw sketch estimates are
    // engine-specific, so the hash-checked output is (a) the exact
    // distinct counts and (b) booleans asserting each estimate sits
    // inside its published error bound — DuckDB emits literal TRUE for
    // those, so any out-of-bound sketch flips the hash red):
    //  - HLL++ at rsd=0.02 must land within ±5% of the exact count
    //    (2.5 standard errors);
    //  - approx_percentile at accuracy=1000 guarantees rank error
    //    ≤ 1/1000, so the returned element must lie between the exact
    //    interpolated quantiles at q∓0.02 (20× the guarantee).
    ("q_sketch_aggs", (s: SparkSession, d: String) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(approx_count_distinct("l_partkey", 0.02).as("approx_parts"),
             countDistinct(col("l_partkey")).as("exact_parts"),
             expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 1000)").as("ap"),
             expr("percentile(l_extendedprice, array(0.48, 0.52, 0.93, 0.97))").as("ep"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx_parts") - col("exact_parts")) <=
            col("exact_parts") * 0.05).as("parts_ok"),
          (col("ap")(0) >= col("ep")(0) && col("ap")(0) <= col("ep")(1)).as("p50_ok"),
          (col("ap")(1) >= col("ep")(2) && col("ap")(1) <= col("ep")(3)).as("p95_ok"))
        .orderBy("l_returnflag")
    }, Some("""
      SELECT l_returnflag,
             CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
             TRUE AS parts_ok, TRUE AS p50_ok, TRUE AS p95_ok
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // B20b (r13): mergeable KLL quantile sketch — percentiles for
    // UNBOUNDED value domains where the B41/B52 domain-histogram
    // trick doesn't apply at 100 TB (functions/KllSketch.scala, a
    // native TypedImperativeAggregate with partial/merge like
    // freq_sketch). Graded the B20 way: exact group counts are
    // hash-checked, and each sketch estimate must land inside the
    // exact interpolated quantile bracket at q∓0.03 (a 3%-rank
    // envelope). Envelope vs WORST CASE, not just measured error
    // (r13 ADVICE): partial-sketch merge order is nondeterministic,
    // so the envelope must contain the deterministic-KLL worst-case
    // rank error ≈ log2(n/k)/k for ANY merge order — at k=1024
    // that is ~1.2% at sf1 (n≈1.5M/group) and still ~2.6% at
    // n=10¹¹ (100 TB), both inside 3% (measured error is ≲0.2%).
    // DuckDB emits literal TRUE for those booleans, so any
    // out-of-envelope estimate flips the hash red at every SF.
    ("q_sketch_quantiles", (s: SparkSession, d: String) => {
      graft.functions.GraftFunctions.register(s)
      val v = cents(col("l_extendedprice"))
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          call_function("kll_quantiles", v, lit(1024),
            array(lit(0.25), lit(0.5), lit(0.75), lit(0.95))).as("kq"),
          call_function("percentile", v,
            array(lit(0.22), lit(0.28), lit(0.47), lit(0.53),
              lit(0.72), lit(0.78), lit(0.92), lit(0.98))).as("ep"),
          count(lit(1)).as("n_rows"))
        .select(col("l_returnflag"), col("n_rows"),
          (col("kq")(0) >= col("ep")(0) && col("kq")(0) <= col("ep")(1)).as("p25_ok"),
          (col("kq")(1) >= col("ep")(2) && col("kq")(1) <= col("ep")(3)).as("p50_ok"),
          (col("kq")(2) >= col("ep")(4) && col("kq")(2) <= col("ep")(5)).as("p75_ok"),
          (col("kq")(3) >= col("ep")(6) && col("kq")(3) <= col("ep")(7)).as("p95_ok"))
        .orderBy("l_returnflag")
    }, Some("""
      SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
             TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p75_ok, TRUE AS p95_ok
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // B55 (r13, replanned r14): CDC MERGE / upsert report — the
    // Delta/Iceberg `MERGE INTO` surface expressed Spark-first (one
    // FULL OUTER join + CASE, the exact plan a table format's merge
    // compiles to): a deterministic change batch (per ordering
    // customer: total spend as the new balance; keys ≡0 mod 97 are
    // deletes; keys ≡0 mod 50 ALSO arrive as genuinely-new rows at
    // key + max(c_custkey), i.e. keys absent from the target) merges
    // into the customer snapshot. Action is decided by MATCH STATUS,
    // the way a real MERGE does: matched + op=D → delete, matched →
    // update, not-matched-by-target → insert, not-matched-by-source →
    // unchanged. r13 verdict: the old shape drew insert keys from
    // o_custkey, which TPC-H FKs guarantee exist in customer, so the
    // insert clause was never exercised end-to-end; the max-key offset
    // makes every insert row a true new-key insert provable by the
    // oracle. The report is the per-action audit every upsert pipeline
    // logs — row counts and the exact-cents balance mass each action
    // carries (update: new balances; delete: REMOVED old balances;
    // insert: inserted; unchanged: kept) — which together checksum the
    // post-merge table. One shuffle join on the merge key plus a 1-row
    // broadcast for max(c_custkey); money in exact int64 cents.
    // r15 growth audit (r14 verdict item 8, the 2.34x STRESS row):
    // tools/ProfMerge decomposes the wall — sf1 cumulative: customer
    // scan 0.14 s, +orders agg 0.22, +change-batch explode 0.15,
    // +full-outer 0.08, +action rollup 0.07 (graded 0.89 s vs 0.56 s
    // at sf0.1 = 1.6x for 10x data, sub-linear on a quiet box). No
    // stage dominates and none grows super-linearly; the r14 2.34x
    // was scheduler noise on sub-second walls — job-floor class.
    // r17 co-partition audit (r16 verdict item 6): the change batch
    // CANNOT reuse the orders-agg hash partitioning for the merge
    // join — the mod-50 insert rows carry a DERIVED key (k + mx), so
    // the exploded frame's distribution on `k` is not a function of
    // the aggregation's partitioning and Catalyst is right to
    // re-exchange. The plan's one merge-key shuffle is minimal;
    // graded floor (Bench annotation) on ProfMerge's evidence.
    ("q_merge_upsert", (s: SparkSession, d: String) => {
      val cust = Tables.customer(s, d).select(col("c_custkey"),
        cents(col("c_acctbal")).as("bal"))
      val maxKey = cust.agg(max("c_custkey").as("mx"))
      val base = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("k"))
        .agg(sum(cents(col("o_totalprice"))).as("spend"))
      // both change-batch branches (the in-place row and, for mod-50
      // keys, the offset new-key row) come off ONE orders aggregation
      // — a union of two `base` references would re-scan and re-agg
      // orders twice
      val chg = base.crossJoin(broadcast(maxKey))
        .select(explode(array_compact(array(
          struct(col("k"), col("spend"),
            when(col("k") % 97L === 0L, lit("D")).otherwise(lit("U")).as("op")),
          when(col("k") % 50L === 0L,
            struct((col("k") + col("mx")).as("k"), col("spend"),
              lit("U").as("op")))))).as("e"))
        .select(col("e.k").as("k"), col("e.spend").as("spend"), col("e.op").as("op"))
      cust.join(chg, col("c_custkey") === col("k"), "full_outer")
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
        .orderBy("action")
    }, Some("""
      WITH mx AS (SELECT max(c_custkey) AS m FROM customer),
      base AS (
        SELECT o_custkey AS k,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend
        FROM orders GROUP BY o_custkey),
      chg AS (
        SELECT k, spend, CASE WHEN k % 97 = 0 THEN 'D' ELSE 'U' END AS op FROM base
        UNION ALL
        SELECT k + m, spend, 'U' FROM base, mx WHERE k % 50 = 0),
      act AS (
        SELECT CASE WHEN c_custkey IS NULL THEN 'insert'
                    WHEN k IS NULL THEN 'unchanged'
                    WHEN op = 'D' THEN 'delete'
                    ELSE 'update' END AS action,
               CASE WHEN c_custkey IS NULL THEN spend
                    WHEN k IS NULL OR op = 'D' THEN CAST(round(c_acctbal * 100) AS BIGINT)
                    ELSE spend END AS bal_cents
        FROM customer FULL OUTER JOIN chg ON c_custkey = k)
      SELECT action, count(*) AS n_rows,
             CAST(sum(bal_cents) AS BIGINT) AS sum_bal_cents
      FROM act GROUP BY action ORDER BY action""")),

    // B56 (r13): ROLLUP over the CALENDAR hierarchy (year → quarter)
    // — the time-dimension companion to B10's attribute rollup (every
    // finance dashboard's quarter-subtotal + annual-total shape):
    // order revenue in exact cents at (year, quarter), per-year
    // subtotals, and the grand total in ONE pass (Expand over the
    // aggregated frame, no re-scan per level). `lvl` disambiguates
    // rollup NULLs (no null dates exist, but the discipline matters);
    // NULLS FIRST ordering pinned explicitly — Spark's asc default
    // and DuckDB's differ.
    ("q_time_rollup", (s: SparkSession, d: String) => {
      Tables.orders(s, d)
        .select(year(col("o_orderdate")).as("y"),
          quarter(col("o_orderdate")).as("q"),
          cents(col("o_totalprice")).as("c"))
        .rollup("y", "q")
        .agg(sum("c").as("rev_cents"), count(lit(1)).as("n_orders"))
        .withColumn("lvl",
          when(col("y").isNull, 2).when(col("q").isNull, 1).otherwise(0))
        .orderBy(col("y").asc_nulls_first, col("q").asc_nulls_first)
    }, Some("""
      SELECT y, q, CAST(sum(c) AS BIGINT) AS rev_cents,
             count(*) AS n_orders,
             CAST(CASE WHEN GROUPING(y) = 1 THEN 2
                  WHEN GROUPING(q) = 1 THEN 1 ELSE 0 END AS INTEGER) AS lvl
      FROM (
        SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
               CAST(quarter(o_orderdate) AS INTEGER) AS q,
               CAST(round(o_totalprice * 100) AS BIGINT) AS c
        FROM orders)
      GROUP BY ROLLUP (y, q)
      ORDER BY y NULLS FIRST, q NULLS FIRST""")),

    // B16: UNION + dedup across sources.
    ("q_union_keys", (s: SparkSession, d: String) => {
      val a = Tables.orders(s, d).select(col("o_custkey").as("custkey")).withColumn("src", lit("orders"))
      val b = Tables.customer(s, d).filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("custkey")).withColumn("src", lit("rich"))
      a.unionByName(b)
        .groupBy("src")
        .agg(countDistinct("custkey").as("n_distinct"), count(lit(1)).as("n_rows"))
        .unionByName(
          a.unionByName(b).agg(lit("all").as("src"),
            countDistinct("custkey").as("n_distinct"), count(lit(1)).as("n_rows")))
        .orderBy("src")
    }, Some("""
      WITH u AS (
        SELECT o_custkey AS custkey, 'orders' AS src FROM orders
        UNION ALL
        SELECT c_custkey AS custkey, 'rich' AS src FROM customer WHERE c_acctbal > 5000)
      SELECT src, count(DISTINCT custkey) AS n_distinct, count(*) AS n_rows FROM u GROUP BY src
      UNION ALL
      SELECT 'all' AS src, count(DISTINCT custkey) AS n_distinct, count(*) AS n_rows FROM u
      ORDER BY src""")),

    // B33: national market share (TPC-H Q8 flavor): of ASIA's ECONOMY
    // revenue per year, the fraction supplied by NATION_3. One
    // fact-fact shuffle (lineitem⋈orders); every dimension broadcast;
    // the share divides two identical int64 cent-product sums (promo-
    // share precedent) so both engines round the same double.
    ("q8_market_share", (s: SparkSession, d: String) => {
      val li = Tables.lineitem(s, d)
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      // Part BHJ FIRST: p_type='ECONOMY' keeps ~1/6 of lineitem, and a
      // broadcast join is map-side — placing it before the orderkey
      // shuffle join cuts the fact exchange 6×. (Catalyst does not
      // cost-reorder joins here; the declared order IS the plan order.)
      // r17: the ASIA-customer dims fold into the orders side BEFORE
      // the shuffle (only matching orders cross, three post-shuffle
      // probes gone) and the volume product collapses to one long
      // below the exchange.
      li.join(broadcast(Tables.part(s, d)).filter(col("p_type") === "ECONOMY"),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          (cents(col("l_extendedprice")) * cents(lit(1) - col("l_discount"))).as("vol"))
        .join(ord
            .join(broadcast(Tables.customer(s, d).select("c_custkey", "c_nationkey")),
              col("o_custkey") === col("c_custkey"))
            .join(broadcast(Tables.nation(s, d)
                .select(col("n_nationkey").as("cn_key"), col("n_regionkey"))),
              col("c_nationkey") === col("cn_key"))
            .join(broadcast(Tables.region(s, d)).filter(col("r_name") === "ASIA"),
              col("n_regionkey") === col("r_regionkey"))
            .select("o_orderkey", "o_orderdate")
            .hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)
            .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("sn_key"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(round(
          sum(when(col("supp_nation") === "NATION_3", col("vol")).otherwise(0L)) /
            sum(col("vol")), 4).as("mkt_share4"))
        .orderBy("o_year")
    }, Some("""
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             round(sum(CASE WHEN sn.n_name = 'NATION_3'
                       THEN CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round((1 - l_discount) * 100) AS BIGINT)
                       ELSE 0 END)
                   / sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round((1 - l_discount) * 100) AS BIGINT)), 4) AS mkt_share4
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region ON cn.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        AND p_type = 'ECONOMY' AND r_name = 'ASIA'
      GROUP BY 1 ORDER BY o_year""")),

    // B34: returned-item reporting (TPC-H Q10 flavor): top 20
    // customers by revenue lost to returns in a 6-month window.
    // Exact-cents revenue; TopK via the rank-filter rewrite is not
    // needed — a global TakeOrdered(20) moves only 20 rows per
    // partition.
    ("q10_returned_items", (s: SparkSession, d: String) => {
      val li = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
      // r17: revenue product below the fact shuffle (one long/row).
      li.select(col("l_orderkey"),
          (cents(col("l_extendedprice")) * cents(lit(1) - col("l_discount"))).as("v"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(round(sum(col("v")) / 1e4, 2).as("revenue"),
          round(max("c_acctbal"), 2).as("c_acctbal"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    }, Some("""
      SELECT c_custkey, c_name, n_name,
             round(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round((1 - l_discount) * 100) AS BIGINT)) / 1e4, 2) AS revenue,
             round(max(c_acctbal), 2) AS c_acctbal
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
                    JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
      GROUP BY c_custkey, c_name, n_name
      ORDER BY revenue DESC, c_custkey ASC LIMIT 20""")),

    // B35: top supplier(s) by quarterly revenue (TPC-H Q15 flavor —
    // the CREATE VIEW + max-subquery decorrelated to one window over
    // the per-supplier aggregate). The max compare runs on EXACT int64
    // cents, so a revenue tie at the top emits every tied supplier in
    // both engines — the Q15 edge case — and no double decides it.
    ("q15_top_supplier", (s: SparkSession, d: String) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      val rev = li.groupBy("l_suppkey")
        .agg(sum(cents(col("l_extendedprice")) * cents(lit(1) - col("l_discount"))).as("rev_c"))
      rev.withColumn("max_c", max("rev_c").over(Window.partitionBy()))
        .filter(col("rev_c") === col("max_c"))
        .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          round(col("rev_c") / 1e4, 2).as("total_revenue"))
        .orderBy("s_suppkey")
    }, Some("""
      WITH rev AS (
        SELECT l_suppkey,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS rev_c
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, round(rev_c / 1e4, 2) AS total_revenue
      FROM rev JOIN supplier ON l_suppkey = s_suppkey
      WHERE rev_c = (SELECT max(rev_c) FROM rev)
      ORDER BY s_suppkey""")),

    // B36: sales opportunity (TPC-H Q22 flavor, phone-country-code
    // adapted to nationkey, and "no orders" adapted to "no orders
    // since 1999" — this generator gives every customer some order):
    // positive-balance customers in five nations, above the average
    // positive balance, gone quiet — per nation: how many, and how
    // much idle balance. The above-avg predicate cross-multiplies in
    // exact int64 (cents·count > sum-of-cents) so no double average
    // decides membership; the no-recent-orders test is a LEFT ANTI
    // join keyed on custkey over the date-pruned orders scan, not a
    // per-row NOT EXISTS.
    ("q22_sales_opportunity", (s: SparkSession, d: String) => {
      val nations = Seq(1, 3, 5, 7, 9).map(_.toLong)
      val sel = Tables.customer(s, d)
        .filter(col("c_nationkey").isin(nations: _*) && col("c_acctbal") > 0)
      val stats = sel.agg(sum(cents(col("c_acctbal"))).as("sum_c"),
        count(lit(1)).as("cnt"))
      sel.crossJoin(broadcast(stats))
        .filter(cents(col("c_acctbal")) * col("cnt") > col("sum_c"))
        .join(Tables.orders(s, d)
            .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
            .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").as("cntrycode"))
        .agg(count(lit(1)).as("numcust"),
          round(sum(cents(col("c_acctbal"))) / 100.0, 2).as("totacctbal"))
        .orderBy("cntrycode")
    }, Some("""
      WITH sel AS (
        SELECT c_custkey, c_nationkey, c_acctbal,
               CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
        FROM customer
        WHERE c_nationkey IN (1, 3, 5, 7, 9) AND c_acctbal > 0),
      st AS (SELECT CAST(sum(bal_c) AS BIGINT) AS sum_c, count(*) AS cnt FROM sel)
      SELECT c_nationkey AS cntrycode, count(*) AS numcust,
             round(sum(bal_c) / 100.0, 2) AS totacctbal
      FROM sel, st
      WHERE bal_c * cnt > sum_c
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '1999-01-01')
      GROUP BY c_nationkey ORDER BY cntrycode""")),

    // B37: product-type profit rollup (TPC-H Q9 flavor, adapted: no
    // partsupp table in this generator, so supply cost is proxied by
    // p_retailprice * quantity). Profit per supplier-nation per order
    // year over name-matched parts. All money in exact 1e4-unit int64
    // (cents x cents), one fact-fact shuffle (lineitem-orders); part/
    // supplier/nation broadcast.
    ("q9_product_profit", (s: SparkSession, d: String) => {
      val profit =
        cents(col("l_extendedprice")) * cents(lit(1) - col("l_discount")) -
          cents(col("p_retailprice")) * cents(col("l_quantity"))
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).filter(col("p_name").contains("red"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate")
            .hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(money2(sum(profit)).as("sum_profit"))
        .orderBy("nation", "o_year")
    }, Some("""
      SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
             CAST(floor((sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round((1 - l_discount) * 100) AS BIGINT)
                       - CAST(round(p_retailprice * 100) AS BIGINT) * CAST(round(l_quantity * 100) AS BIGINT)) * 2 + 100) / 200.0) AS BIGINT) / 100.0 AS sum_profit
      FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
      WHERE p_name LIKE '%red%'
      GROUP BY 1, 2 ORDER BY nation, o_year""")),

    // B38: important parts (TPC-H Q11 flavor, partsupp value adapted
    // to lineitem revenue): parts whose revenue exceeds 1.2x the
    // per-part average. The scalar HAVING subquery decorrelates to a
    // 1-row broadcast total; membership compares in exact int64
    // (val_c * np * 10 > 12 * tot) so no double average decides the
    // boundary, and the threshold is a FRACTION of the average so the
    // predicate is scale-invariant.
    ("q11_important_parts", (s: SparkSession, d: String) => {
      val v = Tables.lineitem(s, d).groupBy("l_partkey")
        .agg(sum(cents(col("l_extendedprice")) * cents(lit(1) - col("l_discount"))).as("val_c"))
      val t = v.agg(sum("val_c").as("tot"), count(lit(1)).as("np"))
      v.crossJoin(broadcast(t))
        .filter(col("val_c") * col("np") * 10 > col("tot") * 12)
        .select(col("l_partkey").as("p_partkey"),
          money2(col("val_c")).as("value"))
        .orderBy(col("value").desc, col("p_partkey"))
    }, Some("""
      WITH v AS (
        SELECT l_partkey,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS val_c
        FROM lineitem GROUP BY 1),
      t AS (SELECT CAST(sum(val_c) AS BIGINT) AS tot, count(*) AS np FROM v)
      SELECT l_partkey AS p_partkey,
             CAST(floor((val_c * 2 + 100) / 200.0) AS BIGINT) / 100.0 AS value
      FROM v, t
      WHERE val_c * np * 10 > 12 * tot
      ORDER BY value DESC, p_partkey""")),

    // B39: parts/supplier relationship (TPC-H Q16 flavor): distinct
    // supplier counts per (brand, type, size) excluding one brand, one
    // type, and "complaint" suppliers (negative balance stands in for
    // the comment-text match). The NOT IN is a broadcast LEFT ANTI on
    // the tiny bad-supplier list BEFORE the part join, so excluded
    // rows never reach the distinct aggregate.
    ("q16_part_suppliers", (s: SparkSession, d: String) => {
      val bad = Tables.supplier(s, d)
        .filter(col("s_acctbal") < 0).select("s_suppkey")
      Tables.lineitem(s, d)
        .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(broadcast(Tables.part(s, d)
            .filter(col("p_brand") =!= "Brand#3" && col("p_type") =!= "PROMO")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct("l_suppkey").as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    }, Some("""
      SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_brand <> 'Brand#3' AND p_type <> 'PROMO'
        AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      GROUP BY 1, 2, 3
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")),

    // B40: surplus/dominant suppliers (TPC-H Q20 flavor, availqty
    // adapted): suppliers shipping more than half a part's 1997 volume
    // for any SMALL part — the aggregated-subquery semi-join shape.
    // The part share compares exact int64 quantity-cents
    // (q_ps * 2 > q_p); the per-part total is a partition-bounded
    // window over the already-aggregated (part, supplier) frame, not a
    // self-join recompute.
    ("q20_surplus_suppliers", (s: SparkSession, d: String) => {
      val ps = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(broadcast(Tables.part(s, d).filter(col("p_type") === "SMALL")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(sum(cents(col("l_quantity"))).as("q_ps"))
      val dom = ps
        .withColumn("q_p", sum("q_ps").over(Window.partitionBy("l_partkey")))
        .filter(col("q_ps") * 2 > col("q_p"))
        .select("l_suppkey").distinct()
      Tables.supplier(s, d)
        .join(dom, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name").as("nation"))
        .orderBy("s_suppkey")
    }, Some("""
      WITH ps AS (
        SELECT l_partkey, l_suppkey,
               CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS q_ps
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_type = 'SMALL'
          AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1, 2),
      p AS (SELECT l_partkey AS pk, CAST(sum(q_ps) AS BIGINT) AS q_p FROM ps GROUP BY 1)
      SELECT s_suppkey, s_name, n_name AS nation
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE s_suppkey IN (
        SELECT l_suppkey FROM ps JOIN p ON l_partkey = pk WHERE q_ps * 2 > q_p)
      ORDER BY s_suppkey""")),

    // B41: equi-depth histogram (8 buckets) of l_extendedprice —
    // optimizer-statistics collection WITHOUT a global sort: rows
    // collapse map-side onto the exact-cents value domain (bounded by
    // the price grid — qty 1-50 × part price domain — independent of
    // row count, the same domain-bounded-frame argument as the CCNet
    // quality thirds), the prefix sum runs over that tiny frame, and
    // a value lands in the bucket of its exclusive cumulative rank.
    // Value-atomic: all rows of one distinct value share a bucket, so
    // bucket populations wobble around N/8 exactly like real
    // equi-depth stats do.
    ("q_equidepth", (s: SparkSession, d: String) => {
      // the prefix sum runs over the DISTINCT-VALUE frame, whose size
      // is bounded by the price grid (583k values at sf1) and does
      // not grow with corpus rows. r13: the shared range-partitioned
      // prefix sum (centsCumHist) replaced the r11 SinglePartition
      // window — measured faster at sf1 AND 10× (see the helper doc).
      centsCumHist(s, d)
        .withColumn("bucket",
          call_function("div", col("cum_excl") * 8L, col("total")).cast("int"))
        .groupBy("bucket")
        .agg((min("v") / 100.0).as("lo"), (max("v") / 100.0).as("hi"),
          sum("cnt").as("n_rows"), count(lit(1)).as("n_values"))
        .orderBy("bucket")
    }, Some("""
      WITH h AS (
        SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v, count(*) AS cnt
        FROM lineitem GROUP BY 1),
      t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM h),
      c AS (SELECT v, cnt, COALESCE(sum(cnt) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl
            FROM h),
      b AS (SELECT CAST((cum_excl * 8) // total AS INTEGER) AS bucket, v, cnt
            FROM c, t)
      SELECT bucket, min(v) / 100.0 AS lo, max(v) / 100.0 AS hi,
             CAST(sum(cnt) AS BIGINT) AS n_rows, count(*) AS n_values
      FROM b GROUP BY bucket ORDER BY bucket""")),

    // B42: Z-order (Morton) layout audit — the data-clustering
    // decision behind Delta/Iceberg OPTIMIZE ZORDER at 100 TB. Both
    // join dims quantize to 8-bit range buckets; 64 "files" are cut
    // either linearly (by orderkey bucket alone) or by the top bits of
    // the 16-bit interleaved Morton code; the report is each layout's
    // summed per-file min-max span in BOTH dims — the exact quantity
    // min/max zone maps skip on. Linear files are razor-thin in x but
    // span all of y; Z-order files are ~32×32 tiles, so predicates on
    // EITHER dim prune ~8× better than the worse linear dim. One scan,
    // two tiny groupBys; the Morton code is pure integer bit math in
    // identical form both engines.
    ("q_zorder", (s: SparkSession, d: String) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey").cast("long").as("ok"),
          col("l_partkey").cast("long").as("pk"))
      val mx = li.agg(max("ok").as("mok"), max("pk").as("mpk"))
      val q = li.crossJoin(broadcast(mx))
        .select(
          least(lit(255L), call_function("div", col("ok") * 256L, col("mok") + 1L)).as("x"),
          least(lit(255L), call_function("div", col("pk") * 256L, col("mpk") + 1L)).as("y"))
      val zc = (0 until 8).map { i =>
        (shiftright(col("x"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
          (shiftright(col("y"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
      }.reduce(_ + _)
      def spans(df: DataFrame, file: Column, layout: String): DataFrame =
        df.groupBy(file.as("file"))
          .agg((max("x") - min("x") + 1L).as("sx"),
            (max("y") - min("y") + 1L).as("sy"), count(lit(1)).as("n"))
          .agg(lit(layout).as("layout"), count(lit(1)).as("n_files"),
            sum("sx").as("span_x_total"), sum("sy").as("span_y_total"),
            sum("n").as("n_rows"))
      spans(q, call_function("div", col("x") * 64L, lit(256L)), "linear")
        .unionAll(spans(q.withColumn("zc", zc),
          call_function("div", col("zc"), lit(1024L)), "zorder"))
        .orderBy("layout")
    }, {
      val zExpr = (0 until 8).map { i =>
        s"(((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1})"
      }.mkString(" + ")
      Some(s"""
      WITH m AS (SELECT max(l_orderkey) AS mok, max(l_partkey) AS mpk FROM lineitem),
      q AS (SELECT least(255, (l_orderkey * 256) // (mok + 1)) AS x,
                   least(255, (l_partkey * 256) // (mpk + 1)) AS y
            FROM lineitem, m),
      z AS (SELECT x, y, $zExpr AS zc FROM q),
      lf AS (SELECT (x * 64) // 256 AS file, max(x) - min(x) + 1 AS sx,
                    max(y) - min(y) + 1 AS sy, count(*) AS n
             FROM q GROUP BY 1),
      zf AS (SELECT zc // 1024 AS file, max(x) - min(x) + 1 AS sx,
                    max(y) - min(y) + 1 AS sy, count(*) AS n
             FROM z GROUP BY 1)
      SELECT 'linear' AS layout, count(*) AS n_files,
             CAST(sum(sx) AS BIGINT) AS span_x_total,
             CAST(sum(sy) AS BIGINT) AS span_y_total,
             CAST(sum(n) AS BIGINT) AS n_rows
      FROM lf
      UNION ALL
      SELECT 'zorder', count(*), CAST(sum(sx) AS BIGINT),
             CAST(sum(sy) AS BIGINT), CAST(sum(n) AS BIGINT)
      FROM zf
      ORDER BY layout""")
    }),

    // B42b: the WRITE path behind q_zorder's audit — actually writes
    // both layouts as parquet (one file per bucket via dynamic
    // partitioning), reads the zone maps back from the REAL file
    // footers (Layout.fileZones — parquet min/max statistics, the
    // exact metadata a pruning reader consults), and reports how many
    // files each layout scans for a 2-dim predicate and a y-only
    // predicate. Bucketing is deterministic closed-form (zc//1024 /
    // x//4 over 8-bit quantized keys, 64 buckets each) so DuckDB
    // derives the identical per-bucket zones straight from lineitem —
    // a hash match proves the written files contain exactly the
    // computed buckets AND that their footer stats are tight. The
    // driver-side part touches 64 zone rows (metadata), never data.
    ("q_zorder_files", (s: SparkSession, d: String) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey").cast("long").as("ok"),
          col("l_partkey").cast("long").as("pk"))
      val mx = li.agg(max("ok").as("mok"), max("pk").as("mpk"))
      val q = li.crossJoin(broadcast(mx))
        .select(Layout.quantize8(col("ok"), col("mok")).as("x"),
          Layout.quantize8(col("pk"), col("mpk")).as("y"))
      val base = q
        .withColumn("zb", call_function("div", Layout.morton2(col("x"), col("y")), lit(1024L)))
        .withColumn("lb", call_function("div", col("x"), lit(4L)))
      // Per-process temp path (PID + session hash): a fixed sf-keyed
      // path raced when a bench and a correctness run hit the same sf
      // concurrently — one process's footer scan could read files
      // mid-overwrite from the other. Cleaned up after the zone rows
      // are collected (they are collected eagerly below).
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft-zorder-files-" +
        s"${new java.io.File(d).getName}-${java.lang.ProcessHandle.current().pid()}"
      val tW0 = System.nanoTime()
      // r17 (guide §2.6): the two layout writes are independent jobs —
      // submit them from two driver threads so the second write's
      // tasks back-fill executors freed by the first's commit tail
      // (sequential writes left the machine idle through each commit;
      // min write_s 2.4 -> ~1.4 s at sf0.1).
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val wz = Future {
        base.select("x", "y", "zb").repartition(8, col("zb"))
          .write.mode("overwrite").partitionBy("zb").parquet(s"$tmp/z")
      }
      val wl = Future {
        base.select("x", "y", "lb").repartition(8, col("lb"))
          .write.mode("overwrite").partitionBy("lb").parquet(s"$tmp/l")
      }
      Await.result(wz, Duration.Inf)
      Await.result(wl, Duration.Inf)
      // report the file-write share of the wall so the bench artifact
      // can split plan-vs-write time (Layout.noteZorderWrite doc)
      Layout.noteZorderWrite((System.nanoTime() - tW0) / 1e9)
      def zoneRows(sub: String): Seq[(Long, Long, Long, Long, Long)] =
        Layout.partitionZones(s, s"$tmp/$sub", Seq("x", "y")).map {
          case (_, z, n) =>
            (z("x")._1, z("x")._2, z("y")._1, z("y")._2, n)
        }
      import s.implicits._
      val zonesBySub = Seq("l" -> zoneRows("l"), "z" -> zoneRows("z")).toMap
      graft.util.AtomicDir.deleteRec(tmp)
      def report(layout: String, sub: String): DataFrame =
        zonesBySub(sub).toDF("min_x", "max_x", "min_y", "max_y", "n")
          .withColumn("layout", lit(layout))
          .groupBy("layout")
          .agg(count(lit(1)).as("n_files"),
            sum(when(!(col("max_x") < 64L || col("min_x") > 79L ||
              col("max_y") < 128L || col("min_y") > 191L), 1L)
              .otherwise(0L)).as("scan_xy"),
            sum(when(!(col("max_y") < 128L || col("min_y") > 191L), 1L)
              .otherwise(0L)).as("scan_y"),
            sum(when(!(col("max_x") < 64L || col("min_x") > 79L ||
              col("max_y") < 128L || col("min_y") > 191L), col("n"))
              .otherwise(0L)).as("rows_xy"),
            sum(col("max_x") - col("min_x") + 1L).as("span_x_total"),
            sum(col("max_y") - col("min_y") + 1L).as("span_y_total"))
      report("linear", "l").unionAll(report("zorder", "z")).orderBy("layout")
    }, {
      val zExpr = (0 until 8).map { i =>
        s"(((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1})"
      }.mkString(" + ")
      Some(s"""
      WITH m AS (SELECT max(l_orderkey) AS mok, max(l_partkey) AS mpk FROM lineitem),
      q AS (SELECT least(255, (l_orderkey * 256) // (mok + 1)) AS x,
                   least(255, (l_partkey * 256) // (mpk + 1)) AS y
            FROM lineitem, m),
      b AS (SELECT x, y, ($zExpr) // 1024 AS zb, x // 4 AS lb FROM q),
      zz AS (SELECT zb, min(x) AS min_x, max(x) AS max_x, min(y) AS min_y,
                    max(y) AS max_y, count(*) AS n FROM b GROUP BY 1),
      lz AS (SELECT lb, min(x) AS min_x, max(x) AS max_x, min(y) AS min_y,
                    max(y) AS max_y, count(*) AS n FROM b GROUP BY 1),
      rep AS (
        SELECT 'linear' AS layout, min_x, max_x, min_y, max_y, n FROM lz
        UNION ALL
        SELECT 'zorder', min_x, max_x, min_y, max_y, n FROM zz)
      SELECT layout, count(*) AS n_files,
             CAST(sum(CASE WHEN NOT (max_x < 64 OR min_x > 79 OR max_y < 128 OR min_y > 191)
                      THEN 1 ELSE 0 END) AS BIGINT) AS scan_xy,
             CAST(sum(CASE WHEN NOT (max_y < 128 OR min_y > 191)
                      THEN 1 ELSE 0 END) AS BIGINT) AS scan_y,
             CAST(sum(CASE WHEN NOT (max_x < 64 OR min_x > 79 OR max_y < 128 OR min_y > 191)
                      THEN n ELSE 0 END) AS BIGINT) AS rows_xy,
             CAST(sum(max_x - min_x + 1) AS BIGINT) AS span_x_total,
             CAST(sum(max_y - min_y + 1) AS BIGINT) AS span_y_total
      FROM rep GROUP BY layout ORDER BY layout""")
    }),

    // B44: encoding/compression audit — the other half of the layout
    // decision (B42 chooses file CUTS; this predicts how well each
    // column RLE/dictionary-encodes under the table's physical order):
    // per column, distinct count, number of value RUNS in
    // (l_orderkey, l_linenumber) order, average run length, and the
    // encoding a parquet writer would pick (integer rules shared with
    // the oracle). The run count needs adjacent-row compares in a
    // GLOBAL order — decomposed exactly like ev_lateness: within-block
    // lag windows (block = orderkey div 4096, so partitions are
    // bounded) plus a tiny per-block first/last frame whose self-join
    // stitches the block boundaries. No global sort at any scale.
    ("q_encoding_audit", (s: SparkSession, d: String) => {
      val li = Tables.lineitem(s, d).select(
        (col("l_orderkey") * 10L + col("l_linenumber")).as("ok"),
        expr("l_orderkey div 4096").as("blk"),
        col("l_returnflag").cast("string").as("returnflag"),
        col("l_linestatus").cast("string").as("linestatus"),
        col("l_quantity").cast("long").cast("string").as("quantity"))
      val t = li.selectExpr("ok", "blk",
        "stack(3, 'returnflag', returnflag, 'linestatus', linestatus, 'quantity', quantity) AS (cname, val)")
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic
      // corpus — ties ordered by val make the run count independent
      // of which engine's sort wins within a tie group (permuting
      // equal-val rows never changes adjacent-inequality counts)
      val wB = Window.partitionBy("cname", "blk").orderBy("ok", "val")
      val inBlk = t.withColumn("prev", lag("val", 1).over(wB))
        .groupBy("cname")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("prev").isNotNull && col("prev") =!= col("val"), 1L)
            .otherwise(0L)).as("chg_in"))
      // stitch against the previous EXISTING block (lag over the tiny
      // per-block frame), not blk-1: present blocks need not be
      // contiguous (id-shifted replicas, pruned partitions)
      val firstLast = t.groupBy("cname", "blk")
        .agg(min(struct(col("ok"), col("val"))).getField("val").as("first_val"),
          max(struct(col("ok"), col("val"))).getField("val").as("last_val"))
      val wFL = Window.partitionBy("cname").orderBy("blk")
      val bnd = firstLast
        .withColumn("prev_last", lag("last_val", 1).over(wFL))
        .groupBy("cname")
        .agg(sum(when(col("prev_last").isNotNull &&
          col("prev_last") =!= col("first_val"), 1L)
          .otherwise(0L)).as("chg_bnd"))
      val nd = t.groupBy("cname").agg(countDistinct("val").as("n_distinct"))
      inBlk.join(bnd, Seq("cname"), "left").join(nd, Seq("cname"))
        .withColumn("n_runs",
          col("chg_in") + coalesce(col("chg_bnd"), lit(0L)) + 1L)
        .select(col("cname"), col("n_rows"), col("n_distinct"), col("n_runs"),
          graft.text.TextOps.ratio4(col("n_rows"), col("n_runs")).as("avg_run_len4"),
          when(col("n_rows") >= col("n_runs") * 8L, "RLE_DICT")
            .when(col("n_distinct") * 20L <= col("n_rows"), "DICT")
            .otherwise("PLAIN").as("pred_encoding"))
        .orderBy("cname")
    }, Some("""
      WITH t AS (
        SELECT l_orderkey * 10 + l_linenumber AS ok, 'returnflag' AS cname,
               l_returnflag AS val FROM lineitem
        UNION ALL
        SELECT l_orderkey * 10 + l_linenumber, 'linestatus', l_linestatus FROM lineitem
        UNION ALL
        SELECT l_orderkey * 10 + l_linenumber, 'quantity',
               CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) FROM lineitem),
      l AS (
        SELECT cname, val,
               lag(val) OVER (PARTITION BY cname ORDER BY ok, val) AS prev
        FROM t),
      a AS (
        SELECT cname, count(*) AS n_rows,
               count(DISTINCT val) AS n_distinct,
               CAST(sum(CASE WHEN prev IS NOT NULL AND prev <> val THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_runs
        FROM l GROUP BY cname)
      SELECT cname, n_rows, n_distinct, n_runs,
             ((20000 * n_rows + n_runs) // (2 * n_runs)) / 10000.0 AS avg_run_len4,
             CASE WHEN n_rows >= n_runs * 8 THEN 'RLE_DICT'
                  WHEN n_distinct * 20 <= n_rows THEN 'DICT'
                  ELSE 'PLAIN' END AS pred_encoding
      FROM a ORDER BY cname""")),

    // B45: ANALYZE TABLE — the optimizer-statistics collection pass
    // every cost-based planner runs before choosing join orders and
    // broadcast sides (Spark's own ANALYZE TABLE … COMPUTE STATISTICS
    // FOR COLUMNS): per column, row/null counts, exact NDV, min/max.
    // Non-integer columns normalize to int64 first (cents, epoch
    // days) so min/max hash identically cross-engine; the unpivot
    // triples the scan but every aggregate partial-combines map-side
    // and the output is |columns| rows.
    ("q_analyze_stats", (s: SparkSession, d: String) => {
      val li = Tables.lineitem(s, d).select(
        col("l_orderkey").cast("long").as("orderkey"),
        col("l_partkey").cast("long").as("partkey"),
        col("l_suppkey").cast("long").as("suppkey"),
        col("l_quantity").cast("long").as("quantity"),
        cents(col("l_extendedprice")).as("price_cents"),
        datediff(to_date(col("l_shipdate")), lit("1970-01-01").cast("date"))
          .cast("long").as("shipdate_day"))
      val t = li.selectExpr(
        "stack(6, 'orderkey', orderkey, 'partkey', partkey, 'suppkey', suppkey, " +
          "'quantity', quantity, 'price_cents', price_cents, 'shipdate_day', shipdate_day) AS (cname, val)")
      t.groupBy("cname")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("val").isNull, 1L).otherwise(0L)).as("n_nulls"),
          countDistinct("val").as("ndv"),
          min("val").as("min_v"), max("val").as("max_v"))
        .orderBy("cname")
    }, Some("""
      WITH li AS (
        SELECT CAST(l_orderkey AS BIGINT) AS orderkey,
               CAST(l_partkey AS BIGINT) AS partkey,
               CAST(l_suppkey AS BIGINT) AS suppkey,
               CAST(l_quantity AS BIGINT) AS quantity,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
               CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS shipdate_day
        FROM lineitem),
      t AS (
        SELECT 'orderkey' AS cname, orderkey AS val FROM li
        UNION ALL SELECT 'partkey', partkey FROM li
        UNION ALL SELECT 'suppkey', suppkey FROM li
        UNION ALL SELECT 'quantity', quantity FROM li
        UNION ALL SELECT 'price_cents', price_cents FROM li
        UNION ALL SELECT 'shipdate_day', shipdate_day FROM li)
      SELECT cname, count(*) AS n_rows,
             CAST(sum(CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
             count(DISTINCT val) AS ndv,
             min(val) AS min_v, max(val) AS max_v
      FROM t GROUP BY cname ORDER BY cname""")),

    // B43: incremental aggregate maintenance — the materialized-view
    // argument at 100 TB: additive partial states (sum, count) over a
    // closed HISTORY partition combine with the DELTA partition's
    // states instead of re-scanning history. The query runs both paths
    // in one plan — combine(history ⊎ delta) and a full recompute —
    // and emits the per-month states plus a `matches` proof column.
    // Money in exact int64 cents (partial-state combination is only
    // sound because the state is order-insensitive — the same reason
    // the §6 hygiene rule exists).
    ("q_mv_incremental", (s: SparkSession, d: String) => {
      val o = Tables.orders(s, d).select(
        date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        col("o_orderdate"), cents(col("o_totalprice")).as("c"))
      def part(df: DataFrame, tag: String): DataFrame =
        df.groupBy("month").agg(count(lit(1)).as("n"), sum("c").as("rev"))
          .withColumn("part", lit(tag))
      val hist = part(o.filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp")), "hist")
      val delta = part(o.filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp")), "delta")
      val combined = hist.unionAll(delta)
        .groupBy("month").agg(sum("n").as("n_inc"), sum("rev").as("rev_inc"))
      val full = o.groupBy("month")
        .agg(count(lit(1)).as("n_full"), sum("c").as("rev_full"))
      combined.join(full, Seq("month"))
        .select(col("month"), col("n_inc"), money2(col("rev_inc") * 100).as("rev_inc2"),
          (col("n_inc") === col("n_full") && col("rev_inc") === col("rev_full")).as("matches"))
        .orderBy("month")
    }, Some("""
      WITH o AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS month, o_orderdate,
               CAST(round(o_totalprice * 100) AS BIGINT) AS c
        FROM orders),
      hist AS (SELECT month, count(*) AS n, CAST(sum(c) AS BIGINT) AS rev
               FROM o WHERE o_orderdate < TIMESTAMP '1998-01-01' GROUP BY month),
      delta AS (SELECT month, count(*) AS n, CAST(sum(c) AS BIGINT) AS rev
                FROM o WHERE o_orderdate >= TIMESTAMP '1998-01-01' GROUP BY month),
      combined AS (
        SELECT month, CAST(sum(n) AS BIGINT) AS n_inc,
               CAST(sum(rev) AS BIGINT) AS rev_inc
        FROM (SELECT * FROM hist UNION ALL SELECT * FROM delta) GROUP BY month),
      f AS (SELECT month, count(*) AS n_full, CAST(sum(c) AS BIGINT) AS rev_full
            FROM o GROUP BY month)
      SELECT combined.month AS month, n_inc,
             (floor((rev_inc * 100 * 2 + 100) / 200)) / 100.0 AS rev_inc2,
             (n_inc = n_full AND rev_inc = rev_full) AS matches
      FROM combined JOIN f ON combined.month = f.month
      ORDER BY combined.month""")),

    // B46: referential-integrity / data-contract audit — the check a
    // warehouse runs before promoting a snapshot: every FK edge of
    // the star schema gets (rows scanned, orphan count) via a
    // LEFT ANTI join on the key, and every PK gets its duplicate
    // count (rows − distinct keys). Shapes at 100 TB: dim-side anti
    // joins (nation/region/customer/supplier/part) broadcast the
    // parent key column; the two fact-fact edges
    // (lineitem→orders, orders→customer) shuffle on their join key —
    // key-column-only projections, so the exchange carries one int64
    // per row. Each check is a count-only aggregate; the union frame
    // is |checks| rows. All-zero results on clean TPC-H data are the
    // point: the op proves the invariants, it does not assume them.
    ("q_fk_audit", (s: SparkSession, d: String) => {
      // one scan per CHILD table, not per check: each table's FK
      // orphan flags come from left joins against DISTINCT parent-key
      // sets (distinct so a corrupt dup-PK parent cannot inflate the
      // child row count), its PK dup count from countDistinct in the
      // same aggregate, and the per-table single-row agg explodes
      // into its (check_name, n_rows, n_bad) rows — so lineitem is
      // read once for all four of its checks.
      def isNull0(c: Column): Column = sum(when(c.isNull, 1L).otherwise(0L))
      def rows(agg: DataFrame, checks: (String, Column, Column)*): DataFrame =
        agg.select(explode(array(checks.map { case (n, r, b) =>
            struct(lit(n).as("check_name"), r.as("n_rows"), b.as("n_bad"))
          }: _*)).as("c"))
          .select(col("c.check_name"), col("c.n_rows"), col("c.n_bad"))
      val li = Tables.lineitem(s, d); val ord = Tables.orders(s, d)
      val cust = Tables.customer(s, d); val sup = Tables.supplier(s, d)
      val nat = Tables.nation(s, d); val reg = Tables.region(s, d)
      val prt = Tables.part(s, d)
      val natKeys = nat.select(col("n_nationkey")).distinct()
      val liAgg = li
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"), col("l_linenumber"))
        .join(broadcast(prt.select(col("p_partkey")).distinct()),
          col("l_partkey") === col("p_partkey"), "left")
        .join(broadcast(sup.select(col("s_suppkey")).distinct()),
          col("l_suppkey") === col("s_suppkey"), "left")
        .join(ord.select(col("o_orderkey")).distinct(),
          col("l_orderkey") === col("o_orderkey"), "left")
        .agg(count(lit(1)).as("n"), isNull0(col("o_orderkey")).as("orph_ord"),
          isNull0(col("p_partkey")).as("orph_part"),
          isNull0(col("s_suppkey")).as("orph_supp"),
          (count(lit(1)) - countDistinct("l_orderkey", "l_linenumber")).as("dup"))
      val ordAgg = ord.select(col("o_orderkey"), col("o_custkey"))
        .join(broadcast(cust.select(col("c_custkey")).distinct()),
          col("o_custkey") === col("c_custkey"), "left")
        .agg(count(lit(1)).as("n"), isNull0(col("c_custkey")).as("orph"),
          (count(lit(1)) - countDistinct("o_orderkey")).as("dup"))
      val custAgg = cust.select(col("c_custkey"), col("c_nationkey"))
        .join(broadcast(natKeys), col("c_nationkey") === col("n_nationkey"), "left")
        .agg(count(lit(1)).as("n"), isNull0(col("n_nationkey")).as("orph"),
          (count(lit(1)) - countDistinct("c_custkey")).as("dup"))
      val supAgg = sup.select(col("s_suppkey"), col("s_nationkey"))
        .join(broadcast(natKeys), col("s_nationkey") === col("n_nationkey"), "left")
        .agg(count(lit(1)).as("n"), isNull0(col("n_nationkey")).as("orph"),
          (count(lit(1)) - countDistinct("s_suppkey")).as("dup"))
      val natAgg = nat.select(col("n_nationkey"), col("n_regionkey"))
        .join(broadcast(reg.select(col("r_regionkey")).distinct()),
          col("n_regionkey") === col("r_regionkey"), "left")
        .agg(count(lit(1)).as("n"), isNull0(col("r_regionkey")).as("orph"),
          (count(lit(1)) - countDistinct("n_nationkey")).as("dup"))
      val regAgg = reg.agg(count(lit(1)).as("n"),
        (count(lit(1)) - countDistinct("r_regionkey")).as("dup"))
      val prtAgg = prt.agg(count(lit(1)).as("n"),
        (count(lit(1)) - countDistinct("p_partkey")).as("dup"))
      Seq(
        rows(liAgg,
          ("fk:lineitem.l_orderkey", col("n"), col("orph_ord")),
          ("fk:lineitem.l_partkey", col("n"), col("orph_part")),
          ("fk:lineitem.l_suppkey", col("n"), col("orph_supp")),
          ("pk:lineitem", col("n"), col("dup"))),
        rows(ordAgg,
          ("fk:orders.o_custkey", col("n"), col("orph")),
          ("pk:orders", col("n"), col("dup"))),
        rows(custAgg,
          ("fk:customer.c_nationkey", col("n"), col("orph")),
          ("pk:customer", col("n"), col("dup"))),
        rows(supAgg,
          ("fk:supplier.s_nationkey", col("n"), col("orph")),
          ("pk:supplier", col("n"), col("dup"))),
        rows(natAgg,
          ("fk:nation.n_regionkey", col("n"), col("orph")),
          ("pk:nation", col("n"), col("dup"))),
        rows(regAgg, ("pk:region", col("n"), col("dup"))),
        rows(prtAgg, ("pk:part", col("n"), col("dup")))
      ).reduce(_.unionAll(_)).orderBy("check_name")
    }, Some("""
      SELECT * FROM (
        SELECT 'fk:lineitem.l_orderkey' AS check_name,
               (SELECT count(*) FROM lineitem) AS n_rows,
               (SELECT count(*) FROM lineitem l LEFT JOIN orders o
                  ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL) AS n_bad
        UNION ALL
        SELECT 'fk:lineitem.l_partkey',
               (SELECT count(*) FROM lineitem),
               (SELECT count(*) FROM lineitem l LEFT JOIN part p
                  ON l.l_partkey = p.p_partkey WHERE p.p_partkey IS NULL)
        UNION ALL
        SELECT 'fk:lineitem.l_suppkey',
               (SELECT count(*) FROM lineitem),
               (SELECT count(*) FROM lineitem l LEFT JOIN supplier sp
                  ON l.l_suppkey = sp.s_suppkey WHERE sp.s_suppkey IS NULL)
        UNION ALL
        SELECT 'fk:orders.o_custkey',
               (SELECT count(*) FROM orders),
               (SELECT count(*) FROM orders o LEFT JOIN customer c
                  ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL)
        UNION ALL
        SELECT 'fk:customer.c_nationkey',
               (SELECT count(*) FROM customer),
               (SELECT count(*) FROM customer c LEFT JOIN nation n
                  ON c.c_nationkey = n.n_nationkey WHERE n.n_nationkey IS NULL)
        UNION ALL
        SELECT 'fk:supplier.s_nationkey',
               (SELECT count(*) FROM supplier),
               (SELECT count(*) FROM supplier sp LEFT JOIN nation n
                  ON sp.s_nationkey = n.n_nationkey WHERE n.n_nationkey IS NULL)
        UNION ALL
        SELECT 'fk:nation.n_regionkey',
               (SELECT count(*) FROM nation),
               (SELECT count(*) FROM nation n LEFT JOIN region r
                  ON n.n_regionkey = r.r_regionkey WHERE r.r_regionkey IS NULL)
        UNION ALL
        SELECT 'pk:customer', (SELECT count(*) FROM customer),
               (SELECT count(*) - count(DISTINCT c_custkey) FROM customer)
        UNION ALL
        SELECT 'pk:lineitem', (SELECT count(*) FROM lineitem),
               (SELECT count(*) - count(DISTINCT (l_orderkey, l_linenumber)) FROM lineitem)
        UNION ALL
        SELECT 'pk:nation', (SELECT count(*) FROM nation),
               (SELECT count(*) - count(DISTINCT n_nationkey) FROM nation)
        UNION ALL
        SELECT 'pk:orders', (SELECT count(*) FROM orders),
               (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders)
        UNION ALL
        SELECT 'pk:part', (SELECT count(*) FROM part),
               (SELECT count(*) - count(DISTINCT p_partkey) FROM part)
        UNION ALL
        SELECT 'pk:region', (SELECT count(*) FROM region),
               (SELECT count(*) - count(DISTINCT r_regionkey) FROM region)
        UNION ALL
        SELECT 'pk:supplier', (SELECT count(*) FROM supplier),
               (SELECT count(*) - count(DISTINCT s_suppkey) FROM supplier)
      ) ORDER BY check_name"""))
    ,

    // B51 (r12): UNPIVOT / melt — the remaining reshape surface next
    // to B13's pivot: wide per-returnflag money marginals melt into
    // (flag, metric, value) rows through Spark's native
    // Dataset.unpivot (one Expand over the aggregated frame — the
    // same single-scan shape the grouping-sets tier uses; nothing
    // re-reads the fact table per metric). Values in exact int64
    // (qty units / cents) so the melt is type-stable.
    ("q_unpivot", (s: SparkSession, d: String) => {
      val wide = Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
          sum(call_function("div",
            cents(col("l_extendedprice")) * cents(lit(1) - col("l_discount")),
            lit(100L))).cast("long").as("sum_disc_cents"))
      wide.unpivot(
          Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_base_cents"), col("sum_disc_cents")),
          "metric", "value")
        .orderBy("l_returnflag", "metric")
    }, Some("""
      WITH w AS (
        SELECT l_returnflag,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round((1 - l_discount) * 100) AS BIGINT) // 100) AS BIGINT) AS sum_disc_cents
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, metric, value FROM (
        SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w
        UNION ALL
        SELECT l_returnflag, 'sum_base_cents', sum_base_cents FROM w
        UNION ALL
        SELECT l_returnflag, 'sum_disc_cents', sum_disc_cents FROM w)
      ORDER BY l_returnflag, metric""")),

    // B52 (r12): percentile_cont — INTERPOLATED percentiles (the SQL
    // standard surface next to B12's exact/discrete form) with no
    // global row sort: rows collapse onto the cents value histogram
    // (price-domain-bounded, corpus-independent — the q_equidepth
    // observation), an exclusive prefix sum ranks the values, and
    // each requested q resolves its bracketing ranks lo=⌊(n−1)q⌋ and
    // lo+1 by conditional-min against the cum ranges. The interpolated
    // value is EXACT integer arithmetic end to end: rank positions in
    // 1/100 units, result in dollars·10⁴ = v_lo·100 + (v_hi−v_lo)·rem
    // — no float ever decides a boundary (DuckDB's own quantile_cont
    // returns the same construction as a double).
    ("q_percentile_cont", (s: SparkSession, d: String) => {
      import s.implicits._
      // r13: shared range-partitioned prefix sum (centsCumHist) —
      // same replan note as q_equidepth.
      val cumH = centsCumHist(s, d).withColumnRenamed("total", "n")
      val pcts = Seq(25L, 50L, 75L, 90L, 99L).toDF("pct")
      cumH.crossJoin(broadcast(pcts))
        .withColumn("target", (col("n") - 1L) * col("pct"))
        .withColumn("lo", call_function("div", col("target"), lit(100L)))
        .withColumn("rem", col("target") % 100L)
        .groupBy("pct", "rem")
        .agg(
          min(when(col("cum_excl") <= col("lo")
            && col("lo") < col("cum_excl") + col("cnt"), col("v"))).as("v_lo"),
          min(when(col("cum_excl") <= col("lo") + 1L
            && col("lo") + 1L < col("cum_excl") + col("cnt"), col("v"))).as("v_hi0"))
        .select(col("pct"),
          (col("v_lo") * 100L +
            (coalesce(col("v_hi0"), col("v_lo")) - col("v_lo")) * col("rem"))
            .as("value_e4"))
        .orderBy("pct")
    }, Some("""
      WITH h AS (
        SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
               CAST(count(*) AS BIGINT) AS cnt
        FROM lineitem GROUP BY 1),
      t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM h),
      c AS (SELECT v, cnt, COALESCE(sum(cnt) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl
            FROM h),
      p AS (SELECT unnest([25, 50, 75, 90, 99]) AS pct),
      j AS (
        SELECT p.pct, (t.n - 1) * p.pct AS target,
               ((t.n - 1) * p.pct) // 100 AS lo,
               ((t.n - 1) * p.pct) % 100 AS rem,
               c.v, c.cnt, c.cum_excl
        FROM c CROSS JOIN t CROSS JOIN p),
      g AS (
        SELECT pct, rem,
               min(CASE WHEN cum_excl <= lo AND lo < cum_excl + cnt THEN v END) AS v_lo,
               min(CASE WHEN cum_excl <= lo + 1 AND lo + 1 < cum_excl + cnt THEN v END) AS v_hi0
        FROM j GROUP BY pct, rem)
      SELECT CAST(pct AS BIGINT) AS pct,
             CAST(v_lo * 100 + (coalesce(v_hi0, v_lo) - v_lo) * rem AS BIGINT) AS value_e4
      FROM g ORDER BY pct""")),

    // B53 (r12): time-based RANGE window frame — the trailing-window
    // aggregate every ops dashboard wants ("customer's 90-day spend
    // at order time"), expressed as RANGE BETWEEN 90 PRECEDING AND
    // CURRENT ROW over epoch DAYS (the A54 convention: a numeric
    // range key makes calendar gaps count correctly, where a ROWS
    // frame would silently span them). Windows partition by customer
    // — the natural shuffle key — money in exact int64 cents; the
    // window runs over the FULL history and only the output is
    // trimmed to a stable probe set.
    ("q_trailing_spend", (s: SparkSession, d: String) => {
      val base = Tables.orders(s, d).select(
        col("o_orderkey"), col("o_custkey"),
        (unix_timestamp(col("o_orderdate")) / 86400L).cast("long").as("day"),
        cents(col("o_totalprice")).as("sp"))
      val w = Window.partitionBy("o_custkey").orderBy("day")
        .rangeBetween(-90L, 0L)
      base
        .withColumn("trailing_90d_cents", sum("sp").over(w))
        .withColumn("n_orders_90d", count(lit(1)).over(w))
        .filter(col("o_orderkey") < 2000L)
        .select("o_orderkey", "o_custkey", "day", "sp",
          "trailing_90d_cents", "n_orders_90d")
        .orderBy("o_orderkey")
    }, Some("""
      WITH b AS (
        SELECT o_orderkey, o_custkey,
               CAST(epoch(o_orderdate) // 86400 AS BIGINT) AS day,
               CAST(round(o_totalprice * 100) AS BIGINT) AS sp
        FROM orders),
      wdw AS (
        SELECT o_orderkey, o_custkey, day, sp,
               CAST(sum(sp) OVER (PARTITION BY o_custkey ORDER BY day
                 RANGE BETWEEN 90 PRECEDING AND CURRENT ROW) AS BIGINT) AS trailing_90d_cents,
               CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY day
                 RANGE BETWEEN 90 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_orders_90d
        FROM b)
      SELECT o_orderkey, o_custkey, day, sp, trailing_90d_cents, n_orders_90d
      FROM wdw WHERE o_orderkey < 2000 ORDER BY o_orderkey""")),

    // B54 (r12): MODE / most-frequent-value per group (the SQL:2023
    // MODE() aggregate surface): per (returnflag, linestatus), the
    // most frequent order quantity with its count and exact share —
    // argmax over the tiny (group, value) count frame through the
    // rank-filter → TopKPerKey rewrite (deterministic tie-break:
    // count desc, value asc — engines must agree when two modes tie).
    // One partial-agged exchange onto the |groups|·|values| frame;
    // nothing row-scale is ever ranked.
    ("q_mode_quantity", (s: SparkSession, d: String) => {
      val counts = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_quantity").cast("long").as("qty"))
        .groupBy("l_returnflag", "l_linestatus", "qty")
        .agg(count(lit(1)).as("n"))
      val tot = counts.groupBy("l_returnflag", "l_linestatus")
        .agg(sum("n").as("tn"))
      val w = Window.partitionBy("l_returnflag", "l_linestatus")
        .orderBy(col("n").desc, col("qty").asc)
      counts.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .join(tot, Seq("l_returnflag", "l_linestatus"))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("qty").as("mode_qty"), col("n"),
          graft.text.TextOps.ratio4(col("n"), col("tn")).as("share4"))
        .orderBy("l_returnflag", "l_linestatus")
    }, Some("""
      WITH c AS (
        SELECT l_returnflag, l_linestatus, CAST(l_quantity AS BIGINT) AS qty,
               CAST(count(*) AS BIGINT) AS n
        FROM lineitem GROUP BY 1, 2, 3),
      t AS (SELECT l_returnflag, l_linestatus, CAST(sum(n) AS BIGINT) AS tn
            FROM c GROUP BY 1, 2),
      r AS (SELECT *, row_number() OVER (PARTITION BY l_returnflag, l_linestatus
              ORDER BY n DESC, qty ASC) AS rk FROM c)
      SELECT r.l_returnflag, r.l_linestatus, r.qty AS mode_qty, r.n,
             ((20000 * r.n + t.tn) // (2 * t.tn)) / 10000.0 AS share4
      FROM r JOIN t USING (l_returnflag, l_linestatus)
      WHERE rk = 1 ORDER BY l_returnflag, l_linestatus"""))
  )
}
