package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class PqAssignSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // plain-Scala reference: 4dp-HALF_UP-rounded squared L2, strict-<
  // argmin keeps the lowest code id on ties
  private def reference(v: Array[Double], cb: Array[Double]): Array[Double] = {
    val out = new Array[Double](16)
    for (p <- 0 until 8) {
      var bestD = Double.MaxValue
      var bestJ = -1
      for (j <- 0 until 16) {
        var s = 0.0
        for (i <- 0 until 8) {
          val diff = v(p * 8 + i) - cb((p * 16 + j) * 8 + i)
          s += diff * diff
        }
        val r = BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        if (r < bestD) { bestD = r; bestJ = j }
      }
      out(2 * p) = bestD
      out(2 * p + 1) = bestJ.toDouble
    }
    out
  }

  test("pq_assign matches the scalar reference on random inputs (eval + codegen path)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = Seq.fill(20)(Array.fill(64)(rnd.nextDouble() - 0.5))
    val cb = Array.fill(8 * 16 * 8)(rnd.nextDouble() - 0.5)
    val df = vecs.map(v => (v.toSeq, cb.toSeq)).toDF("v", "cb")
    val got = df.selectExpr("pq_assign(v, cb) AS a").collect()
      .map(_.getSeq[Double](0).toArray)
    vecs.zip(got).foreach { case (v, a) =>
      assert(a.toSeq === reference(v, cb).toSeq)
    }
  }

  test("pq_assign tiebreak: identical candidate distances pick the lowest code id") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // all codebook entries equal → every distance ties → code 0 wins
    val v = Array.fill(64)(0.25)
    val cb = Array.fill(8 * 16 * 8)(0.5)
    val a = Seq((v.toSeq, cb.toSeq)).toDF("v", "cb")
      .selectExpr("pq_assign(v, cb) AS a").collect().head.getSeq[Double](0)
    for (p <- 0 until 8) assert(a(2 * p + 1) === 0.0)
  }
}
