package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import scala.util.Random
import graft.TestSpark

/** Misra-Gries guarantees, exercised on a stream whose vocabulary is
  * far larger than the counter budget (so decrement/merge-subtract
  * paths actually run, unlike the small-vocab test corpus).
  */
class FreqSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val k = 20

  // skewed synthetic stream: 10 planted heavy items + long random tail
  private def stream(): (org.apache.spark.sql.DataFrame, Map[String, Long], Long) = {
    import spark.implicits._
    val rnd = new Random(7)
    val heavy = (0 until 10).flatMap(i => Seq.fill(2000 - 100 * i)(s"hot_$i"))
    val tail = Seq.fill(15000)(s"cold_${rnd.nextInt(3000)}")
    val all = rnd.shuffle(heavy ++ tail)
    val exact = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    (all.toDF("term").repartition(8), exact, all.size.toLong)
  }

  test("sketch keys are a superset of all items with count > n/(k+1)") {
    GraftFunctions.register(spark)
    val (df, exact, n) = stream()
    val sk = df.agg(expr(s"freq_sketch(term, $k)").as("sk"))
      .select(col("sk")).collect()(0).getMap[String, Long](0)
    assert(sk.size <= k, s"sketch kept ${sk.size} > k=$k counters")
    val mustHave = exact.filter(_._2 > n / (k + 1)).keySet
    assert(mustHave.nonEmpty, "test stream must contain heavy hitters")
    val missing = mustHave -- sk.keySet
    assert(missing.isEmpty, s"guaranteed heavy hitters missing from sketch: $missing")
  }

  test("estimates underestimate by at most n/(k+1), never overestimate") {
    GraftFunctions.register(spark)
    val (df, exact, n) = stream()
    val sk = df.agg(expr(s"freq_sketch(term, $k)").as("sk"))
      .select(col("sk")).collect()(0).getMap[String, Long](0)
    sk.foreach { case (term, est) =>
      val truth = exact.getOrElse(term, 0L)
      assert(est <= truth, s"$term overestimated: $est > $truth")
      assert(truth - est <= n / (k + 1) + 1,
        s"$term error ${truth - est} exceeds n/(k+1)=${n / (k + 1)}")
    }
  }

  test("works as a grouped aggregate (per-group sketches)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = (1 to 1000).map(i => (i % 2, if (i % 3 == 0) "x" else s"y$i"))
      .toDF("g", "term")
    val rows = df.groupBy("g").agg(expr("freq_sketch(term, 5)").as("sk"))
      .select(col("g"), map_keys(col("sk")).as("ks")).collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      assert(r.getSeq[String](1).contains("x"),
        s"group ${r.getInt(0)}: dominant item x missing")
    }
  }
}
