package graft.tools

import org.apache.spark.sql.functions._

/** Attribute ann_ivf's CPU: time each sub-frame through the noop sink
  * (guide §1.4) — cross-join+cosine, rank-1 TopKPerKey, full query.
  */
object ProfIvf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Graft.session("graft-profivf")
    graft.functions.GraftFunctions.register(spark)
    spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    val c = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cents = broadcast(
      c.orderBy(pmod(xxhash64(col("vec_id")), lit(997L)), col("vec_id"))
        .limit(16)
        .select(col("vec_id").as("cid"), col("v").as("cv")))
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val scored = c.join(cents)
      .selectExpr("vec_id", "v", "cid", "cosine_sim(v, cv) AS cs")
    time("scan only")(noop(c))
    time("cross join only")(noop(c.join(cents).select("vec_id", "cid")))
    time("cross join + cosine (no v out)")(noop(
      c.join(cents).selectExpr("vec_id", "cid", "cosine_sim(v, cv) AS cs")))
    time("scored incl v")(noop(scored))
    time("rank1 topk")(noop(graft.plans.TopKPerKeyOps.topK(scored, Seq("vec_id"),
      Seq(col("cs").desc, col("cid").asc), 1)))
    time("full ann_ivf")(noop(graft.SparkEntry.queries("ann_ivf")(spark, sfDir)))
    spark.stop()
  }
}
