package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Tables, TestSpark}

class RankFilterToTopKSpec extends AnyFunSuite {
  private lazy val spark = { TestSpark.spark }

  private def rankFiltered(k: Int): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, TestSpark.sf)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  private def withRewrite[A](body: => A): A = {
    TopKPerKeyOps.enableRewrite(spark)
    try body
    finally spark.conf.set("spark.graft.topk.rewrite", "true")
  }

  test("rewrite fires: rank-filter plans through the TopKPerKey exec pair") {
    withRewrite {
      val plan = rankFiltered(3).queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKeyPartial"), plan.take(2000))
      assert(plan.contains("TopKPerKeyFinal"))
    }
  }

  test("rewritten plan is value-identical to the window idiom, rank column included") {
    withRewrite {
      def canon(df: DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      val rewritten = canon(rankFiltered(3))
      spark.conf.set("spark.graft.topk.rewrite", "false")
      val vanilla = canon(rankFiltered(3))
      assert(rewritten === vanilla)
      assert(rewritten.nonEmpty)
    }
  }

  test("kill-switch and maxK guard leave the plan alone") {
    withRewrite {
      spark.conf.set("spark.graft.topk.rewrite", "false")
      assert(!rankFiltered(3).queryExecution.executedPlan.toString
        .contains("TopKPerKeyPartial"))
      spark.conf.set("spark.graft.topk.rewrite", "true")
      assert(!rankFiltered(5000).queryExecution.executedPlan.toString
        .contains("TopKPerKeyPartial"), "k above maxK must not rewrite")
    }
  }

  test("rank()/dense_rank() filters are NOT rewritten (ties keep >k rows)") {
    withRewrite {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc)
      val plan = Tables.orders(spark, TestSpark.sf)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rk", rank().over(w))
        .filter(col("rk") <= 3)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("TopKPerKeyPartial"))
    }
  }

  test("rk = 1 equality filter rewrites and matches") {
    withRewrite {
      def canon(df: DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val q = rankFiltered(1).filter(col("rk") === 1).select("o_custkey", "o_orderkey")
      assert(q.queryExecution.executedPlan.toString.contains("TopKPerKeyPartial"))
      val got = canon(q)
      spark.conf.set("spark.graft.topk.rewrite", "false")
      assert(got === canon(rankFiltered(1).select("o_custkey", "o_orderkey")))
    }
  }
}
