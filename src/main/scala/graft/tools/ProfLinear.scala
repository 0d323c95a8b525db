package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Decompose the linear-score family's cost (tx_linear_score,
  * tx_calibration_report, tx_uncertainty_sample share linearScoreS4):
  * the per-(doc,term)-row md5->substring->conv weight chain vs the
  * kernel pass vs a per-distinct-term weights join. Evidence for the
  * r17 optimization choice.
  *
  * Usage: runMain graft.tools.ProfLinear <sfDir>
  */
object ProfLinear {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val s = graft.Graft.session("graft-proflinear")
    Seq("documents").foreach(t => s.read.parquet(s"$d/$t.parquet").count())
    def time(tag: String)(f: => Unit): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROF $tag%-28s ${runs.min}%8.3f s (min of 3)")
    }
    def stubW(t: Column, salt: String): Column =
      (conv(substring(md5(if (salt.isEmpty) t else concat(t, lit(salt))), 1, 8), 16, 10)
        .cast("long") % 20001L) - 10000L
    def dtf: DataFrame = graft.text.TextOps.docTermCounts(s, d)
      .filter(length(col("term")) >= 1)
      .select(col("doc_id"), col("term"), col("tf"))
    def vocab: DataFrame = dtf.groupBy("term").agg(sum("tf").as("n"))
      .orderBy(col("n").desc, col("term").asc)
      .limit(256)
      .select(col("term"), stubW(col("term"), "#v").as("wv"))

    println("rows dtf = " + dtf.count())
    // (a) kernel pass alone
    time("kernel+agg") { dtf.agg(sum("tf")).collect() }
    // (b) per-row md5 chain (current linearScoreS4 shape)
    time("per-row-md5") {
      dtf.join(broadcast(vocab), Seq("term"), "left")
        .select(col("doc_id"), col("tf"),
          coalesce(col("wv"), stubW(col("term"), "")).as("w"))
        .groupBy("doc_id")
        .agg(sum("tf").as("n_toks"), sum(col("tf") * col("w")).cast("long").as("num"))
        .agg(sum("num")).collect()
    }
    // (c) weights join per distinct term (rank_ensemble shape)
    time("weights-join") {
      val termTot = dtf.groupBy("term").agg(sum("tf").as("nn"))
      val v = termTot.orderBy(col("nn").desc, col("term").asc).limit(256)
        .select(col("term"), stubW(col("term"), "#v").as("wv"))
      val weights = termTot.select("term")
        .join(broadcast(v), Seq("term"), "left")
        .select(col("term"), coalesce(col("wv"), stubW(col("term"), "")).as("w"))
      dtf.join(weights, Seq("term"))
        .groupBy("doc_id")
        .agg(sum("tf").as("n_toks"), sum(col("tf") * col("w")).cast("long").as("num"))
        .agg(sum("num")).collect()
    }
    // (d) per-row xxhash-free md5 via typed map on term only (lower bound probe):
    // how much of (b) is the conv/substring/hex chain vs the md5 itself.
    time("per-row-md5-rawjvm") {
      val w = udf((t: String) => {
        val hex = graft.util.Hashing.md5Hex(t)
        (java.lang.Long.parseLong(hex.substring(0, 8), 16) % 20001L) - 10000L
      })
      dtf.join(broadcast(vocab), Seq("term"), "left")
        .select(col("doc_id"), col("tf"),
          coalesce(col("wv"), w(col("term"))).as("w"))
        .groupBy("doc_id")
        .agg(sum("tf").as("n_toks"), sum(col("tf") * col("w")).cast("long").as("num"))
        .agg(sum("num")).collect()
    }
    s.stop()
  }
}
