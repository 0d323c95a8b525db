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

  test("jaccard_sorted matches set semantics on sorted arrays") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT jaccard_sorted(array(1L, 2L, 3L, 5L), array(2L, 3L, 4L)) AS j,
                jaccard_sorted(array(1L, 2L), array(1L, 2L)) AS eq,
                jaccard_sorted(array(1L), array(9L)) AS disj,
                jaccard_sorted(CAST(array() AS ARRAY<BIGINT>), CAST(array() AS ARRAY<BIGINT>)) AS empty
      """).collect()(0)
    assert(math.abs(r.getDouble(0) - 2.0 / 5.0) < 1e-12)
    assert(r.getDouble(1) === 1.0)
    assert(r.getDouble(2) === 0.0)
    assert(r.getDouble(3) === 0.0)
  }

  test("nulls propagate (null-safe binary expression)") {
    GraftFunctions.register(spark)
    val df = spark.sql("SELECT cosine_sim(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D, 2.0D)) AS c")
    assert(df.collect()(0).isNullAt(0))
  }
}
