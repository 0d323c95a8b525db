package graft.tools

import org.apache.spark.sql.functions._

/** Stage-level timing probe for the simhash tier (disposable). */
object ProfSimhash {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Graft.session("graft-prof-simhash")
    graft.functions.GraftFunctions.register(spark)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = graft.Tables.documents(spark, d)
    t("docs count") { docs.count() }

    val base = graft.dedup.DedupOps.simhashSignatures(docs)
    t("signatures (cold)") { base.count() }
    t("signatures (warm)") { base.count() }

    val reps = base.groupBy("simhash")
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("grp_n"))
    t("reps") { reps.count() }

    val grouped = base.join(reps.select(col("simhash"), col("grp_n")), "simhash")
      .filter(col("grp_n") <= 50)
    val zeroPairs = grouped.as("x").join(grouped.as("y"),
        col("x.simhash") === col("y.simhash") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"), lit(0).as("hamming"))
    t("zeroPairs (cold)") { zeroPairs.count() }
    t("zeroPairs (warm)") { zeroPairs.count() }

    val repBase = reps.select(col("doc_id"), col("simhash"))
      .join(base.select(col("doc_id"), col("bands")), "doc_id")
    val banded = repBase.select(col("doc_id"),
      posexplode(col("bands")).as(Seq("band", "bh")))
    t("banded") { banded.count() }

    val cands = graft.dedup.DedupOps.bandedCandidates(banded, 50)
    t("candidates (cold)") { println("[profile] n_cands=" + cands.count()) }
    t("candidates (warm)") { cands.count() }

    val nearPairs = cands
      .join(repBase.select(col("doc_id").as("a"), col("simhash").as("ha")), "a")
      .join(repBase.select(col("doc_id").as("b"), col("simhash").as("hb")), "b")
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))).cast("int"))
      .filter(col("hamming") > 0)
      .select("a", "b", "hamming")
    t("nearPairs (cold)") { nearPairs.count() }
    t("nearPairs (warm)") { nearPairs.count() }

    t("full dd_simhash run1") {
      graft.SparkEntry.queries("dd_simhash")(spark, d).count()
    }
    t("full dd_simhash run2") {
      graft.SparkEntry.queries("dd_simhash")(spark, d).count()
    }
    spark.stop()
  }
}
