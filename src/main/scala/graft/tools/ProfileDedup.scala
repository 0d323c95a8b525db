package graft.tools

import org.apache.spark.sql.functions._

/** Stage-level timing probe for the minhash/LSH tier (disposable; run
  * manually against a replicated SF dir to find where sf1 wall goes).
  */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1x")
    val spark = graft.Graft.session("graft-profile")
    graft.functions.GraftFunctions.register(spark)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val base = graft.Tables.documents(spark, d).select(col("doc_id"), col("text"))
      .filter(length(graft.text.TextOps.normalize(col("text"))) >= 4)
    val clones = base.select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val corpus = base.unionByName(clones)

    val (full, bands) = graft.dedup.DedupOps.minhashSignatures(corpus)
    t("signatures (cold)") { full.count() }
    t("signatures (warm)") { full.count() }

    val banded = bands.select(col("doc_id"),
      posexplode(col("bands")).as(Seq("band", "bh")))
    t("banded explode") { banded.count() }

    // bucket-size histogram: how many (band,bh) buckets, how big
    val bstats = t("bucket stats") {
      banded.groupBy("band", "bh").agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("buckets"), max("n").as("maxN"),
          sum(when(col("n") > 200, expr("n * (n - 1) DIV 2")).otherwise(0L)).as("droppedPairs"),
          sum(when(col("n") <= 200, expr("n * (n - 1) DIV 2")).otherwise(0L)).as("candUpper"))
        .collect()(0)
    }
    println(s"[profile] buckets=${bstats.getLong(0)} maxBucket=${bstats.getLong(1)} droppedPairsUpper=${bstats.getLong(2)} candPairsUpper=${bstats.getLong(3)}")

    val cands = graft.dedup.DedupOps.bandedCandidates(banded, 200)
    t("candidates (cold)") { println("[profile] n_cands=" + cands.count()) }
    t("candidates (warm)") { cands.count() }

    val verified = cands
      .join(full.select(col("doc_id").as("a"), col("sh").as("sha")), "a")
      .join(full.select(col("doc_id").as("b"), col("sh").as("shb")), "b")
      .selectExpr("a", "b", "round(jaccard_sorted(sha, shb), 4) AS jaccard")
    t("verify join (cold)") { verified.count() }
    t("verify join (warm)") { verified.count() }

    t("full planted query run1") {
      graft.SparkEntry.queries("dd_minhash_planted")(spark, d).count()
    }
    t("full planted query run2") {
      graft.SparkEntry.queries("dd_minhash_planted")(spark, d).count()
    }
    t("full lsh query run1") {
      graft.SparkEntry.queries("dd_minhash_lsh")(spark, d).count()
    }
    t("full lsh query run2") {
      graft.SparkEntry.queries("dd_minhash_lsh")(spark, d).count()
    }
    spark.stop()
  }
}
