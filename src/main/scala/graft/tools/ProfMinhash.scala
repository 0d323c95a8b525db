package graft.tools

import org.apache.spark.sql.functions._

/** Stage-level timing breakdown of the planted-minhash path — scratch
  * profiling tool (not part of the driver contract).
  */
object ProfMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = graft.Graft.session("graft-prof")
    import graft.dedup.DedupOps
    val docs = s.read.parquet(s"$sfDir/documents.parquet")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    val base = docs.select(col("doc_id"), col("text"))
      .filter(length(graft.text.TextOps.normalize(col("text"))) >= 4)
    val corpus = base.unionByName(
      base.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    t("signatures (cold)") {
      val (full, _) = DedupOps.minhashSignatures(corpus)
      full.count()
    }
    val (full, bandsDf) = DedupOps.minhashSignatures(corpus)
    t("signatures (memo)") { full.count() }
    val banded = bandsDf.select(col("doc_id"),
      posexplode(col("bands")).as(Seq("band", "bh")))
    t("banded explode") { banded.count() }
    val cands = DedupOps.bandedCandidates(banded, 200)
    t("candidates") { cands.count() }
    val pairs = DedupOps.minhashPairs(corpus, maxBucket = 200)
    t("pairs+jaccard (1st)") { pairs.count() }
    t("pairs+jaccard (2nd)") { pairs.count() }
    t("full query (filter+sort)") {
      pairs.filter(col("jaccard") === 1.0).select("a", "b").orderBy("a", "b").count()
    }
    s.stop()
  }
}
