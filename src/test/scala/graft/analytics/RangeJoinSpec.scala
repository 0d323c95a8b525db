package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Grid-bucketed range join: exact containment semantics and — the
  * point of the operator — an equi-join plan, never a
  * BroadcastNestedLoopJoin, regardless of the intervals side's size.
  */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("matches brute-force containment exactly (overlaps, boundaries, multi-cell spans)") {
    import spark.implicits._
    val points = (0L until 500L).map(i => (i, i * 7L % 1000L)).toDF("pid", "p")
    // overlapping intervals of varied spans incl. zero-width and
    // cell-boundary-aligned ones
    val ivals = Seq(
      (1L, 0L, 100L), (2L, 50L, 60L), (3L, 90L, 300L), (4L, 100L, 101L),
      (5L, 250L, 250L), (6L, 299L, 1000L), (7L, 500L, 530L), (8L, 970L, 1030L))
      .toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(points, ivals,
        col("p"), col("s"), col("e"), grid = 30L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      p <- points.collect().map(r => (r.getLong(0), r.getLong(1)))
      i <- ivals.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      if p._2 >= i._2 && p._2 < i._3
    } yield (p._1, i._1)).toSet
    assert(got === want)
    assert(want.nonEmpty)
    // zero-width [250, 250) matches nothing
    assert(!want.exists(_._2 == 5L))
  }

  test("seeded fuzz: grid join equals brute-force containment for random intervals and grids") {
    import spark.implicits._
    val rnd = new scala.util.Random(1137)
    for (round <- 1 to 5) {
      val grid = Seq(1L, 3L, 7L, 16L, 100L)(round - 1)
      val pts = (0 until 300).map(i => (i.toLong, rnd.nextLong(500L) - 50L))
      val ivs = (0 until 40).map { i =>
        val s = rnd.nextLong(500L) - 60L
        (i.toLong, s, s + rnd.nextLong(80L)) // zero-width allowed
      }
      val got = RangeJoin.pointInInterval(
          pts.toDF("pid", "p"), ivs.toDF("iid", "s", "e"),
          col("p"), col("s"), col("e"), grid)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (pid, p) <- pts; (iid, s, e) <- ivs if p >= s && p < e
      } yield (pid, iid)).toSet
      assert(got === want, s"round $round grid=$grid")
    }
  }

  test("plans as an equi-join even when the intervals side cannot broadcast") {
    import spark.implicits._
    val points = spark.range(1000).select(col("id").as("p"))
    val ivals = spark.range(2000).select(col("id").as("iid"),
      (col("id") * 3L).as("s"), (col("id") * 3L + 10L).as("e"))
    val joined = RangeJoin.pointInInterval(points, ivals,
      col("p"), col("s"), col("e"), grid = 8L)
    val naive = points.join(ivals, col("p") >= col("s") && col("p") < col("e"))
    def shape(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    // the naive inequality join IS the nested loop we refuse to plan
    assert(shape(naive).contains("BroadcastNestedLoopJoin"))
    val plan = shape(joined)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must stay an equi-join:\n${plan.take(1500)}")
    // and it still answers correctly
    assert(joined.count() === naive.count())
  }
}
