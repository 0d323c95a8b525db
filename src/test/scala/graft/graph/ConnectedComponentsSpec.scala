package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Invariants of the min-label-propagation components the oracle
  * can't see: convergence on shapes (chains need diameter rounds,
  * cliques need one), label minimality, and partition soundness.
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def comps(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.components(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain, triangle and isolated pair resolve to min-id components") {
    // chain 1-2-3-4-5 (diameter 4), triangle 10-11-12, pair 20-21
    val got = comps(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L)))
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(got(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(got(_) == 10L))
    assert(Seq(20L, 21L).forall(got(_) == 20L))
  }

  test("edge direction does not matter") {
    assert(comps(Seq((5L, 4L), (3L, 4L), (3L, 2L))) ===
      Map(2L -> 2L, 3L -> 2L, 4L -> 2L, 5L -> 2L))
  }

  test("components partition the vertex set and labels are members") {
    val edges = (0L until 40L).map(i => (i, i / 4 * 4)) // 10 star groups
    val got = comps(edges)
    assert(got.size === 40)
    got.foreach { case (v, c) =>
      assert(c <= v && got(c) === c) // label is a member and the min
      assert(v / 4 * 4 === c)        // stars don't merge
    }
  }

  test("ann_kmeans clusters partition the corpus with K<=8 clusters") {
    val df = graft.SparkEntry.queries("ann_kmeans")(spark, TestSpark.sf)
    val n = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet").count()
    assert(df.count() === n) // every vector assigned exactly once
    val k = df.select(countDistinct("cluster")).collect()(0).getLong(0)
    assert(k >= 1 && k <= 8)
    // cluster_size is consistent with the actual group sizes
    val bad = df.groupBy("cluster").agg(count(lit(1)).as("m"), max("cluster_size").as("cs"))
      .filter(col("m") =!= col("cs")).count()
    assert(bad === 0L)
  }
}
