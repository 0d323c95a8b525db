package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Tables, TestSpark}

class TopKPerKeySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("custom TopKPerKey operator matches the window row_number idiom") {
    val orders = Tables.orders(spark, TestSpark.sf)
      .select("o_custkey", "o_orderkey", "o_totalprice")

    val viaWindow = {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      orders.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3).drop("rk")
    }
    val viaOperator = TopKPerKeyOps.topK(orders, Seq("o_custkey"),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(canon(viaOperator) === canon(viaWindow))
    assert(viaOperator.count() === viaWindow.count())
  }

  test("plan contains the custom partial+final exec pair") {
    val orders = Tables.orders(spark, TestSpark.sf)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val plan = TopKPerKeyOps.topK(orders, Seq("o_custkey"),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyPartial"))
    assert(plan.contains("TopKPerKeyFinal"))
  }

  test("k larger than group size returns whole groups") {
    val df = Tables.orders(spark, TestSpark.sf).filter(col("o_custkey") === 1)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val n = df.count()
    val got = TopKPerKeyOps.topK(df, Seq("o_custkey"),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 1000)
    assert(got.count() === n)
  }
}
