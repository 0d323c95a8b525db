package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("lastBefore matches a brute-force reference on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val left = (0 until 300).map(i => (i.toLong, rnd.nextInt(10).toLong)) // (ord, key)
    // unique (key, ord) on the reference side — duplicate reference
    // rows at the same instant have no defined winner in any engine
    val right = (0 until 150).map { i =>
      (rnd.nextInt(300).toLong, rnd.nextInt(10).toLong, s"v$i")
    }.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    val lDf = left.toDF("ord", "key")
    val rDf = right.toDF("ord", "key", "payload")

    val got = AsOfJoin.lastBefore(lDf, rDf, "key", "ord", Seq("payload"))
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet

    val expected = left.map { case (ord, key) =>
      val best = right.filter(r => r._2 == key && r._1 <= ord)
        .sortBy(_._1).lastOption
      (ord, key, best.map(_._3))
    }.toSet

    assert(got === expected)
  }

  test("strict mode excludes same-ord right rows") {
    import spark.implicits._
    val lDf = Seq((5L, 1L)).toDF("ord", "key")
    val rDf = Seq((5L, 1L, "same-ts"), (3L, 1L, "earlier")).toDF("ord", "key", "payload")
    val nonStrict = AsOfJoin.lastBefore(lDf, rDf, "key", "ord", Seq("payload")).collect()(0)
    assert(nonStrict.getString(2) === "same-ts")
    val strict = AsOfJoin.lastBefore(lDf, rDf, "key", "ord", Seq("payload"), strict = true).collect()(0)
    assert(strict.getString(2) === "earlier")
  }
}
