package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}

class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted join returns exactly the plain join's rows") {
    val li = Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    val ord = Tables.orders(spark, TestSpark.sf)
      .select(col("o_orderkey"), col("o_orderstatus"))

    val plain = li.join(ord, "o_orderkey")
    val salted = SkewJoin.saltedInner(li, ord, "o_orderkey", salt = 8)

    assert(salted.count() === plain.count())
    assert(salted.groupBy("o_orderstatus").count().orderBy("o_orderstatus").collect().toSeq ===
      plain.groupBy("o_orderstatus").count().orderBy("o_orderstatus").collect().toSeq)
  }
}
