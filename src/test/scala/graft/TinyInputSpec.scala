package graft

import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-but-legitimate tiny inputs the r11 advisor flagged: a
  * corpus with a <5-token doc (the shingle generator must emit zero
  * shingles, not crash on sequence(0,-1)), a nation partition with a
  * single customer (percent_rank divisor (n-1) hits 0), and an ANN
  * probe whose recall set has exactly one member (zero pairwise rows
  * must not drop the probe). Each was latent on the synthetic data
  * and trips on real skewed/tiny inputs.
  */
class TinyInputSpec extends AnyFunSuite {

  test("source-overlap queries survive docs shorter than the shingle width") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-shortdoc").toString
    Seq(
      (1L, "tiny doc here", "en", "srcA", 13L), // 3 tokens: no 5-gram
      (2L, "alpha beta gamma delta epsilon zeta eta", "en", "srcA", 40L),
      (3L, "alpha beta gamma delta epsilon theta iota", "en", "srcB", 42L),
      (4L, "one two", "en", "srcB", 7L))       // 2 tokens: no 5-gram
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val exact = SparkEntry.queries("tx_source_overlap")(spark, dir).collect()
    assert(exact.length == 1) // one source pair, short docs contribute nothing
    assert(exact(0).getAs[Long]("n_common") == 1L) // the one shared 5-gram of the alpha.. docs
    val kmv = SparkEntry.queries("tx_source_overlap_kmv")(spark, dir).collect()
    assert(kmv.length == 1)
  }

  test("percent_rank/cume_dist handle a single-customer nation partition") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-lonenation").toString
    Seq((1L, 1L), (2L, 2L), (3L, 2L))
      .toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((10L, 2L, 100.0), (11L, 3L, 50.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val rows = SparkEntry.queries("q_pctrank_custspend")(spark, dir)
      .collect().map(r => r.getAs[Long]("c_custkey") ->
        (r.getAs[Long]("pr_e4"), r.getAs[Long]("cd_e4"))).toMap
    // nation 1 has exactly one customer: percent_rank = 0 (not NULL /
    // divide-by-zero), cume_dist = 1
    assert(rows(1L) == (0L, 10000L))
    // nation 2 (two customers) still computes the rational form
    assert(rows(2L)._1 == 0L && rows(3L)._1 == 10000L)
  }

  test("MMR rerank keeps probes whose candidate set is a singleton") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-lonecand").toString
    // two vectors, both probe ids (< 16): each probe's top-20 recall
    // set is just the other vector — zero pairwise-sim rows
    Seq((0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
        (1L, Array(0.6f, 0.8f, 0.0f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("ann_mmr_rerank")(spark, dir).collect()
    assert(out.length == 2, s"expected both singleton probes, got ${out.length} rows")
    assert(out.forall(_.getAs[Int]("mmr_rank") == 1))
    assert(out.map(_.getAs[Long]("probe")).toSet == Set(0L, 1L))
  }
}
