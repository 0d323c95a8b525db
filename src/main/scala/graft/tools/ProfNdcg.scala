package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window

/** r13 scratch profiler for the tx_ndcg_eval replan: times the shared
  * bm25 frame alone, the localCheckpoint variant, and the plain
  * two-branch variant, so the checkpoint overhead is a measured number.
  */
object ProfNdcg {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Graft.session("prof-ndcg")
    Seq("documents").foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
    def time(label: String)(f: => Long): Unit = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"PROF $label%-22s min=${runs.map(_._1).min}%7.3f s  rows=${runs.head._2}")
    }
    def wgt(rk: Column): Column =
      floor(lit(10000.0) / log2(rk + 1) + 0.5).cast("long")
    def branches(scores: DataFrame): Long = {
      val wS = Window.partitionBy("probe").orderBy(col("score4").desc, col("doc_id").asc)
      val dcg = scores.withColumn("rk", row_number().over(wS)).filter(col("rk") <= 10)
        .groupBy("probe").agg(sum(col("rel") * wgt(col("rk"))).as("dcg_e4"))
      val wI = Window.partitionBy("probe").orderBy(col("rel").desc, col("doc_id").asc)
      val idcg = scores.withColumn("rk", row_number().over(wI)).filter(col("rk") <= 10)
        .groupBy("probe").agg(sum(col("rel") * wgt(col("rk"))).as("idcg_e4"))
      dcg.join(idcg, "probe").count()
    }
    time("bm25_frame_only") { graft.text.TextOps.bm25Scores(spark, sfDir).count() }
    time("ckpt_then_branches") {
      branches(graft.text.TextOps.bm25Scores(spark, sfDir)
        .repartition(col("probe")).localCheckpoint())
    }
    time("ckpt_no_repart") {
      branches(graft.text.TextOps.bm25Scores(spark, sfDir).localCheckpoint())
    }
    time("plain_two_branch") {
      branches(graft.text.TextOps.bm25Scores(spark, sfDir))
    }
    spark.stop()
  }
}
