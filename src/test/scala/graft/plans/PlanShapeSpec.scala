package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** r13 (r12 verdict item 6): plan-SHAPE regression gate. The
  * correctness gate checks answers and the bench checks walls, but
  * neither notices a silent replan — an extra exchange reappearing in
  * a query whose shuffle structure was deliberately engineered (the
  * r11 TPC-H shuffle-hash replans, the r12 IVF broadcast-fold replan,
  * the r13 ndcg single-pass) shows up only as a wall regression weeks
  * later on a noisy machine. This spec pins the executed-plan
  * operator counts (shuffle exchanges, SinglePartition exchanges,
  * broadcast exchanges, TopKPerKey nodes) for the most expensive /
  * most deliberately-planned queries at sf0.001 against committed
  * goldens, failing on ANY drift (both directions — a decrease is a
  * real replan too and must update the golden deliberately).
  *
  * Shapes are deterministic: fixed data, fixed confs (the shipped
  * Graft.session), fixed Spark version; AQE's runtime decisions are a
  * pure function of those. Regenerate goldens after a deliberate
  * replan with:
  *   GRAFT_UPDATE_PLAN_SHAPES=1 sbt "testOnly graft.plans.PlanShapeSpec"
  * then commit the rewritten resource file with the replan.
  */
class PlanShapeSpec extends AnyFunSuite {

  private val goldenPath =
    java.nio.file.Paths.get("src/test/resources/plan-shapes.tsv")

  /** The pinned set: the TPC-H replans worth protecting, the heaviest
    * pipeline operators, and every query whose plan was the subject
    * of a measured round decision.
    */
  private val pinned = Seq(
    "q1_pricing_summary", "q3_top_orders", "q5_supplier_volume",
    "q8_market_share", "q9_product_profit", "q13_cust_distribution",
    "q18_large_orders", "q21_waiting_supplier", "q_equidepth",
    "q_percentile_cont",
    "dd_span_dedup", "dd_containment", "dd_minhash_planted",
    "tx_ndcg_eval", "tx_bm25_search", "tx_heavy_hitters",
    "ann_bruteforce", "ann_ivf", "ann_ivf_pq", "ev_concurrency",
    // r13 additions whose shapes were deliberately engineered: the
    // words-only exchange in the Hamming path, the shared linear-score
    // broadcast, the JL typed kernel, the single-join MERGE
    "ann_binary_hamming", "tx_uncertainty_sample", "ann_jl_report",
    "q_merge_upsert",
    // r14/r15 engineered shapes (r14 verdict item 3): suffix spans'
    // ONE corpus shuffle, the rank ensemble's histogram ranks (no
    // corpus sort, one kernel scan), the graph-ANN typed kernel, and
    // the r15 line-dedup replan (hash-keyed count + semi-join, text
    // only in the doc-local reassembly branch)
    "dd_suffix_spans", "dd_suffix_source", "pipeline_rank_ensemble",
    "ann_graph_search", "ann_graph_cells", "tx_line_dedup",
    // r16 engineered shapes: tx_boilerplate's single (source,ch)
    // exchange + SHUFFLE_HASH probe (no boiler broadcast),
    // tx_vocab_coverage's TakeOrdered-bounded ranking, and the
    // checked-bounded prefix hybrids
    "tx_boilerplate", "tx_vocab_coverage", "ev_lateness",
    "ev_rfm_segments")

  private case class Shape(shuffles: Int, singleParts: Int,
    broadcasts: Int, topks: Int) {
    def tsv: String = s"$shuffles\t$singleParts\t$broadcasts\t$topks"
  }

  private def measure(name: String): Shape = {
    val spark = TestSparkAccess.spark
    val df = graft.SparkEntry.queries(name)(spark, TestSparkAccess.sf)
    df.collect() // materialize THIS frame so AQE reports the final plan
    val plan = df.queryExecution.executedPlan.toString
    Shape(
      plan.linesIterator.count(_.contains("Exchange hashpartitioning")),
      plan.linesIterator.count(_.contains("Exchange SinglePartition")),
      plan.linesIterator.count(_.contains("BroadcastExchange")),
      plan.linesIterator.count(_.contains("TopKPerKey")))
  }

  test("executed-plan operator counts match the committed goldens") {
    val measured = pinned.map(n => n -> measure(n))
    if (sys.env.get("GRAFT_UPDATE_PLAN_SHAPES").contains("1")) {
      val body = measured
        .map { case (n, s) => s"$n\t${s.tsv}" }.mkString("", "\n", "\n")
      java.nio.file.Files.createDirectories(goldenPath.getParent)
      java.nio.file.Files.writeString(goldenPath, body)
      info(s"goldens rewritten: $goldenPath")
    } else {
      assert(java.nio.file.Files.exists(goldenPath),
        s"missing $goldenPath — run once with GRAFT_UPDATE_PLAN_SHAPES=1")
      val golden = java.nio.file.Files.readAllLines(goldenPath)
        .toArray(Array.empty[String]).filter(_.nonEmpty).map { line =>
          val f = line.split("\t")
          f(0) -> Shape(f(1).toInt, f(2).toInt, f(3).toInt, f(4).toInt)
        }.toMap
      val drift = measured.flatMap { case (n, s) =>
        golden.get(n) match {
          case None => Some(s"$n: no golden row (regenerate)")
          case Some(g) if g != s =>
            Some(s"$n: golden(sh=${g.shuffles},sp=${g.singleParts}," +
              s"bc=${g.broadcasts},tk=${g.topks}) != measured(sh=${s.shuffles}," +
              s"sp=${s.singleParts},bc=${s.broadcasts},tk=${s.topks})")
          case _ => None
        }
      }
      assert(drift.isEmpty,
        "plan shapes drifted — a replan happened; if deliberate, " +
          "regenerate goldens with GRAFT_UPDATE_PLAN_SHAPES=1 and commit " +
          "them with the change:\n" + drift.mkString("\n"))
      val stale = golden.keySet -- pinned.toSet
      assert(stale.isEmpty, s"golden rows for unpinned queries: $stale")
    }
  }
}

/** Indirection so this spec (package graft.plans) reuses the shared
  * test session without a package-private leak.
  */
private object TestSparkAccess {
  def spark: org.apache.spark.sql.SparkSession = graft.TestSpark.spark
  def sf: String = graft.TestSpark.sf
}
