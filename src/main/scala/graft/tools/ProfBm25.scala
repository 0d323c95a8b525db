package graft.tools

import org.apache.spark.sql.functions._

/** Scratch profiler for the r14 bm25 replan: where does the
  * tx_bm25_search wall actually go? Times (a) the raw document scan,
  * (b) the tokenize+dl kernel alone, (c) the full score frame, (d)
  * the final top-10, each min-of-2 after warmup.
  *
  * Usage: runMain graft.tools.ProfBm25 <sfDir>
  */
object ProfBm25 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.Graft.session("graft-profbm25")
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet").count()

    def timed(label: String)(f: => Unit): Unit = {
      val t = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"PROF $label%-24s $t%8.3f s")
    }

    timed("scan_only") {
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "text").count()
    }
    timed("tokenize_kernel") {
      graft.text.TextOps.docTermCounts(spark, sfDir)
        .select("doc_id", "term", "tf").count()
    }
    timed("bm25_scores") {
      graft.text.TextOps.bm25Scores(spark, sfDir).count()
    }
    timed("bm25_full") {
      graft.SparkEntry.queries("tx_bm25_search")(spark, sfDir).count()
    }
    spark.stop()
  }
}
