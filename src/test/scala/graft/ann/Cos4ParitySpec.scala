package graft.ann

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The C94 two-layer path computes pivot-bounded cosines DRIVER-side
  * (AnnOps.cos4) while the corpus-side expression and the DuckDB
  * oracle compute round(cosine_sim(a, b), 4). This pins bit-identical
  * agreement over real corpus pairs — the independent-spec mitigation
  * for a shared-construction query (r13 verdict "What's wrong" #4):
  * if the fused-loop order or the HALF_UP rounding ever drifts, this
  * fails before the hash gate does.
  */
class Cos4ParitySpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("cos4 equals round(cosine_sim, 4) bit-for-bit over 256 real corpus pairs") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val vecs = spark.read.parquet(s"${graft.TestSpark.sf}/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .as[(Long, Seq[Double])].orderBy("vec_id").limit(32).collect()
      .map { case (id, v) => (id, v.toArray) }
    assert(vecs.length >= 16)
    val pairs = for (a <- vecs.take(16); b <- vecs.take(16)) yield (a, b)
    val viaExpr = pairs.map { case ((_, va), (_, vb)) => (va.toSeq, vb.toSeq) }.toSeq
      .toDF("a", "b").selectExpr("round(cosine_sim(a, b), 4) AS c")
      .as[Double].collect()
    val viaDriver = pairs.map { case ((_, va), (_, vb)) => AnnOps.cos4(va, vb) }
    viaExpr.zip(viaDriver).zipWithIndex.foreach { case ((e, d), i) =>
      assert(java.lang.Double.doubleToRawLongBits(e) ===
        java.lang.Double.doubleToRawLongBits(d), s"pair $i: expr=$e driver=$d")
    }
  }

  test("cos4 rounding matches Spark Round on adversarial half-boundary values") {
    // values whose 5th decimal sits at a boundary — the place a naive
    // floor(x*1e4+0.5)/1e4 diverges from BigDecimal HALF_UP
    import spark.implicits._
    val xs = Seq(0.00005, 0.12345, 0.99995, -0.00005, -0.12345, 0.257500000000000001)
    val viaExpr = xs.toDF("x").selectExpr("round(x, 4) AS r").as[Double].collect()
    val viaDriver = xs.map(x => java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue())
    assert(viaExpr.toSeq === viaDriver)
  }
}
