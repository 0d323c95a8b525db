package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class IntersectSortedCountSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("intersect_sorted_count matches set intersection (eval + codegen)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val cases = (1 to 30).map { _ =>
      val a = (1 to rnd.nextInt(40)).map(_ => rnd.nextInt(50).toLong).distinct.sorted
      val b = (1 to rnd.nextInt(40)).map(_ => rnd.nextInt(50).toLong).distinct.sorted
      (a, b, a.toSet.intersect(b.toSet).size.toLong)
    }
    val rows = cases.toDF("a", "b", "want")
      .selectExpr("intersect_sorted_count(a, b) AS got", "want").collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("consistency with jaccard_sorted: J = inter / (|a|+|b|-inter)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val a = Seq(1L, 3L, 5L, 7L, 9L)
    val b = Seq(3L, 4L, 5L, 6L)
    val r = Seq((a, b)).toDF("a", "b")
      .selectExpr("intersect_sorted_count(a, b) AS i", "jaccard_sorted(a, b) AS j")
      .head()
    val i = r.getLong(0)
    assert(i == 2L)
    assert(math.abs(r.getDouble(1) - i.toDouble / (a.size + b.size - i)) < 1e-12)
  }
}
