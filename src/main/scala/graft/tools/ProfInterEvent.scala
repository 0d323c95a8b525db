package graft.tools

import org.apache.spark.sql.functions._

/** Stage-by-stage wall breakdown for ev_inter_event_time (round-9
  * advisor item: is the 6.7× sf1 gap the scan, the exchange, or the
  * window?). Each probe is min of 3 after warmup.
  *
  * Usage: runMain graft.tools.ProfInterEvent <sfDir>
  */
object ProfInterEvent {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.Graft.session("graft-prof-iet")
    import spark.implicits._
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.count() // warm page cache

    def t(name: String)(body: => Long): Unit = {
      val ws = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = body
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"PROF $name%-34s ${ws.map(_._1).min}%8.3f s (n=${ws.head._2})")
    }

    val proj = raw.select(col("user_id").as("fid"),
      col("event_type").as("etype"), unix_timestamp(col("ts")).as("es"))

    t("scan3_count")(proj.count())
    t("scan3_agg")(proj.agg(sum("es"), count(lit(1))).collect()(0).getLong(1))
    t("scan_repart_count")(
      proj.repartition(col("fid"), col("etype")).count())
    t("scan_repart_sort_agg")(
      proj.repartition(col("fid"), col("etype"))
        .sortWithinPartitions("fid", "etype", "es")
        .agg(sum("es"), count(lit(1))).collect()(0).getLong(1))
    t("typed_deser_only")(
      proj.as[(java.lang.Long, String, java.lang.Long)]
        .mapPartitions(it => Iterator.single(it.size.toLong)).reduce(_ + _))
    t("full_query")(
      graft.SparkEntry.queries("ev_inter_event_time")(spark, sfDir).count())
    spark.stop()
  }
}
