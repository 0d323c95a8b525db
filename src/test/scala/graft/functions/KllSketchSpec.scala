package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** kll_quantiles (B20b): exactness below capacity, the rank-error
  * envelope under five different partitionings / input orders (the
  * merge-safety property a partial/final Spark aggregation needs —
  * bitwise merge-associativity is not a property any compacting
  * sketch has; rank error under arbitrary merge order is), skewed
  * input, and null/empty behavior.
  */
class KllSketchSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private val qs = Seq(0.01, 0.25, 0.5, 0.75, 0.99)
  private def qsSql = qs.mkString("array(", ", ", ")")

  test("n < k: the sketch is exact (level 0 holds everything)") {
    GraftFunctions.register(spark)
    val n = 300 // below k=400
    val vals = (1L to n.toLong).toSeq
    val shuffled = vals.sortBy(v => graft.util.Hashing.mix64(v))
    val est = shuffled.toDF("v").repartition(5)
      .agg(call_function("kll_quantiles", col("v"), lit(400),
        expr(qsSql))).as[Seq[Long]].head()
    qs.zip(est).foreach { case (q, e) =>
      val target = math.min((q * n).toLong, n - 1L)
      assert(e === target + 1L, s"q=$q") // values are 1..n so rank r holds value r+1
    }
  }

  test("rank error <= 2% under five partitionings and input orders") {
    GraftFunctions.register(spark)
    val n = 50000
    val vals = (1L to n.toLong).toSeq
    val orders = Map(
      "sorted" -> vals,
      "reversed" -> vals.reverse,
      "hashed" -> vals.sortBy(v => graft.util.Hashing.mix64(v)))
    for ((oname, data) <- orders; parts <- Seq(1, 7, 32)) {
      val est = data.toDF("v").repartition(parts)
        .agg(call_function("kll_quantiles", col("v"), lit(400),
          expr(qsSql))).as[Seq[Long]].head()
      qs.zip(est).foreach { case (q, e) =>
        // value v has exact rank v-1 in 1..n
        val rankErr = math.abs((e - 1).toDouble / n - q)
        assert(rankErr <= 0.02,
          s"order=$oname parts=$parts q=$q est=$e rankErr=$rankErr")
      }
    }
  }

  test("skewed input (heavy ties) stays inside the envelope") {
    GraftFunctions.register(spark)
    // zipf-ish: value v repeated ceil(3000/v) times, v in 1..200
    val data = (1 to 200).flatMap(v => Seq.fill(3000 / v + 1)(v.toLong))
    val n = data.size
    val sortedData = data.sorted
    val est = data.sortBy(v => graft.util.Hashing.mix64(v)).toDF("v")
      .repartition(13)
      .agg(call_function("kll_quantiles", col("v"), lit(400),
        expr(qsSql))).as[Seq[Long]].head()
    qs.zip(est).foreach { case (q, e) =>
      // exact rank range of value e in the tied data
      val lo = sortedData.indexWhere(_ == e)
      val hi = sortedData.lastIndexWhere(_ == e)
      assert(lo >= 0, s"estimate $e is not an input value")
      val rankErr = math.max(0.0,
        math.max(lo.toDouble / n - q, q - hi.toDouble / n))
      assert(rankErr <= 0.02, s"q=$q est=$e rankErr=$rankErr")
    }
  }

  test("nulls are ignored; an all-null group evaluates to null") {
    GraftFunctions.register(spark)
    val rows = Seq(("a", Some(1L)), ("a", None), ("a", Some(3L)), ("b", None))
    val out = rows.toDF("g", "v").groupBy("g")
      .agg(call_function("kll_quantiles", col("v"), lit(16),
        expr("array(0.5)")).as("kq"))
      .orderBy("g").collect()
    // group a = (1, 3): target rank = min(floor(0.5*2), 1) = 1;
    // cumulative weights pass 1 at value 3
    assert(out(0).getSeq[Long](1) === Seq(3L))
    assert(out(1).isNullAt(1))
  }
}
