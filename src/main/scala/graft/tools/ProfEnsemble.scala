package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Scratch profiler for pipeline_rank_ensemble: which stage owns the
  * sf1 wall. Replicates the query with stage boundaries.
  * Usage: runMain graft.tools.ProfEnsemble <sfDir>
  */
object ProfEnsemble {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.Graft.session("graft-profens")
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet").count()

    def timed(label: String)(f: => Unit): Unit = {
      val t = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"PROF $label%-24s $t%8.3f s")
    }

    val docsDf = spark.read.parquet(s"$sfDir/documents.parquet")
    val toks0 = TextOps.tokens(col("text"))
    val n = greatest(size(toks0).cast("long"), lit(1L))
    val punct = size(regexp_extract_all(col("text"),
      lit("[^A-Za-z0-9\\s]"), lit(0))).cast("long")
    val stops = TextOps.stopwordHits(toks0, TextOps.stopwords).cast("long")
    val l = greatest(length(col("text")).cast("long"), lit(1L))
    val qn = lit(500L) * stops * l + lit(300L) * (l - punct) * n +
      lit(2L) * least(n, lit(100L)) * n * l
    val qd = lit(1000L) * n * l
    val q4 = call_function("div", qn * 20000L + qd, qd * 2L)
    val wrd = greatest(size(regexp_extract_all(lower(col("text")),
      lit("[a-z0-9]+"), lit(0))).cast("long"), lit(1L))
    val snt = greatest(size(regexp_extract_all(col("text"),
      lit("[.!?]+"), lit(0))).cast("long"), lit(1L))
    val sy = size(regexp_extract_all(lower(col("text")),
      lit("[aeiouy]+"), lit(0))).cast("long")
    val fnum = lit(39L) * wrd * wrd + lit(1180L) * sy * snt - lit(1559L) * snt * wrd
    val fden = lit(100L) * snt * wrd
    val fk4 = signum(fnum).cast("long") *
      call_function("div", abs(fnum) * 20000L + fden, fden * 2L)
    val base = docsDf.select(col("doc_id"), col("source"), q4.as("q4"), fk4.as("fk4"))

    timed("base_signals") { base.count() }

    def stubW(t: org.apache.spark.sql.Column, salt: String) =
      (conv(substring(md5(if (salt.isEmpty) t else concat(t, lit(salt))), 1, 8), 16, 10)
        .cast("long") % 20001L) - 10000L
    val dtf = TextOps.docTermCounts(spark, sfDir)
      .filter(length(col("term")) >= 1)
      .select(col("doc_id"), col("term"), col("tf"))
    val vocab = dtf.groupBy("term").agg(sum("tf").as("nn"))
      .orderBy(col("nn").desc, col("term").asc).limit(256)
      .select(col("term"), stubW(col("term"), "#v").as("wv"))
    val lin = dtf.join(broadcast(vocab), Seq("term"), "left")
      .select(col("doc_id"), col("tf"),
        coalesce(col("wv"), stubW(col("term"), "")).as("w"))
      .groupBy("doc_id")
      .agg(sum("tf").as("n_toks"), sum(col("tf") * col("w")).cast("long").as("num"))
      .select(col("doc_id"),
        (signum(col("num")).cast("long") *
          call_function("div", abs(col("num")) * 2L + col("n_toks"),
            col("n_toks") * 2L)).as("lin4"))

    timed("lin_signal") { lin.count() }

    var scored: DataFrame = null
    timed("scored_checkpoint") {
      scored = base.join(lin, Seq("doc_id"), "left")
        .withColumn("lin4", coalesce(col("lin4"), lit(0L)))
        .localCheckpoint()
    }

    def rankMap(df: DataFrame, c: String, lowerBetter: Boolean): DataFrame = {
      val hist = df.groupBy(c).agg(count(lit(1)).as("cnt"))
      val w = Window
        .orderBy(if (lowerBetter) col(c).asc else col(c).desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      hist.withColumn("rk" + c, coalesce(sum("cnt").over(w), lit(0L)) + 1L)
        .select(col(c), col("rk" + c))
    }
    timed("rankmap_q4") { rankMap(scored, "q4", false).count() }
    val ranked = scored
      .join(broadcast(rankMap(scored, "q4", lowerBetter = false)), "q4")
      .join(broadcast(rankMap(scored, "fk4", lowerBetter = true)), "fk4")
      .join(broadcast(rankMap(scored, "lin4", lowerBetter = false)), "lin4")
      .withColumn("borda", col("rkq4") + col("rkfk4") + col("rklin4"))
    timed("ranked_3joins") { ranked.count() }

    val bHist = ranked.groupBy("borda").agg(count(lit(1)).as("cnt"))
    val half = ranked.agg(
      call_function("div", count(lit(1)) + 1L, lit(2L)).as("half"))
    val wB = Window.orderBy(col("borda").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val med = bHist.withColumn("cum", sum("cnt").over(wB))
      .crossJoin(broadcast(half))
      .filter(col("cum") >= col("half"))
      .agg(min("borda").as("med"))
    timed("median") { med.count() }
    val fin = ranked.crossJoin(broadcast(med))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("borda") <= col("med"), 1L).otherwise(0L))
          .cast("long").as("n_top"),
        min("borda").as("borda_min"), max("borda").as("borda_max"),
        sum("borda").as("bsum"))
    timed("final_rollup") { fin.count() }
    spark.stop()
  }
}
