package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Contract of the capped bucket-collect aggregates: exact membership
  * for groups within the cap, cap+1 elements (droppable) beyond it,
  * stable under partial/merge across many partitions.
  */
class CollectCappedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def grouped(cap: Int) = {
    val s = spark
    import s.implicits._
    GraftFunctions.register(s)
    // group g has g members (1..g), spread over 8 partitions to force
    // partial-aggregate merges
    (1 to 10).flatMap(g => (1 to g).map(i => (g, i.toLong, i.toLong * 100)))
      .toDF("g", "id", "pay")
      .repartition(8)
      .groupBy("g")
      .agg(expr(s"collect_capped(id, $cap)").as("ids"),
        expr(s"collect_capped2(id, pay, $cap)").as("ms"))
  }

  test("groups within the cap collect exactly") {
    val rows = grouped(5).filter(col("g") <= 5)
      .select(col("g"), array_sort(col("ids")).as("ids")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) === (1L to r.getInt(0)))
    }
  }

  test("overflowing groups yield exactly cap+1 elements, ready to drop") {
    val sizes = grouped(5).filter(col("g") > 5)
      .select(col("g"), size(col("ids")).as("n")).collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(sizes.values.toSet === Set(6))
    // the standard guard drops them all
    assert(grouped(5).filter(size(col("ids")).between(2, 5))
      .agg(max("g")).collect()(0).getInt(0) === 5)
  }

  test("pair variant carries payload through the aggregation") {
    val r = grouped(5).filter(col("g") === 4)
      .select(explode(array_sort(col("ms"))).as("p"))
      .select(col("p.k"), col("p.v")).collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    assert(r.toSeq === (1L to 4L).map(i => (i, i * 100)))
  }
}
