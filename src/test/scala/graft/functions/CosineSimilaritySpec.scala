package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class CosineSimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("cosine_sim computes the expected values (eval + codegen agree)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 0.0), Seq(0.0, 1.0), 0.0),       // orthogonal
      (Seq(1.0, 2.0), Seq(2.0, 4.0), 1.0),       // parallel
      (Seq(1.0, 0.0), Seq(-1.0, 0.0), -1.0),     // opposite
      (Seq(1.0, 2.0), Seq(2.0, 3.0), 0.99227788) // known value
    ).toDF("a", "b", "expected")
    val rows = df.selectExpr("cosine_sim(a, b) AS c", "expected").collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-6)
    }
  }

  test("cosine_sim rejects wrong input types at analysis") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(("x", 1)).toDF("a", "b")
    val e = intercept[Exception] { df.selectExpr("cosine_sim(a, b)").collect() }
    assert(e.getMessage.toLowerCase.contains("cosine_sim") ||
      e.getMessage.toLowerCase.contains("type"))
  }

  test("nulls propagate (null-safe binary expression)") {
    GraftFunctions.register(spark)
    val df = spark.sql("SELECT cosine_sim(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D, 2.0D)) AS c")
    assert(df.collect()(0).isNullAt(0))
  }
}
