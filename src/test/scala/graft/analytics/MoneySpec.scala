package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Queries.money2: exact 2dp currency from 1e4-unit int64 amounts.
  * The whole point of the kernel is the half-boundary (amounts ending
  * in 50 1e-4-units), where round(double, 2) diverges between engines
  * (Spark BigDecimal HALF_UP vs a binary double's actual value), so
  * the boundary cases are the spec.
  */
class MoneySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def m2(amounts: Long*): Seq[Double] =
    amounts.toDF("a").select(Queries.money2(col("a")).as("v"))
      .collect().map(_.getDouble(0)).toSeq

  test("money2 rounds exact half-boundaries up, deterministically") {
    // 21836406550 * 1e-4 = 2183640.655 — the sf0.1 q11 row that
    // round(double, 2) flipped between engines
    assert(m2(21836406550L) === Seq(2183640.66))
    assert(m2(50L) === Seq(0.01))      // 0.0050 -> .01
    assert(m2(49L) === Seq(0.0))       // 0.0049 -> .00
    assert(m2(150L) === Seq(0.02))     // 0.0150 -> .02 (half-up, not half-even)
    assert(m2(250L) === Seq(0.03))     // 0.0250 -> .03
  }

  test("money2 is floor-consistent for negative amounts") {
    // floor semantics: -0.0050 -> 0.00 (floor of -0.005+0.005), and
    // -0.0051 -> -0.01; DuckDB's integer division would truncate
    // toward zero instead, which is why both engines use double floor
    assert(m2(-50L) === Seq(0.0))
    assert(m2(-51L) === Seq(-0.01))
    assert(m2(-150L) === Seq(-0.01))   // -0.0150 -> -0.01 (floor of -0.01)
    assert(m2(-10000L) === Seq(-1.0))
  }

  test("money2 equals round(x/1e4, 2) away from half-boundaries") {
    val amounts = (0L until 1000L).map(_ * 997L + 13L).filter(_ % 100 != 50)
    val viaMoney2 = m2(amounts: _*)
    val viaRound = amounts.map(a => BigDecimal(a) / 10000)
      .map(_.setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(viaMoney2 === viaRound)
  }
}
