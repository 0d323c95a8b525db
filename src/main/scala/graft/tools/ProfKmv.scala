package graft.tools

import org.apache.spark.sql.functions._

/** Component breakdown for tx_source_overlap_kmv at sf1: gram
  * distinct, the KMV sketch branch (hash → top-k heap → arrays), and
  * the exact-intersection branch, timed separately.
  */
object ProfKmv {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val spark = graft.Graft.session("graft-prof-kmv")
    def time(tag: String)(f: => Unit): Unit = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROF $tag%-28s min=${runs.min}%6.3f s runs=${runs.map(r => f"$r%.2f").mkString(",")}")
    }
    val g = graft.Tables.documents(spark, sfDir)
      .select(col("source"), explode(expr(
        """CASE WHEN size(split(text, ' ')) >= 5
           THEN transform(sequence(0, size(split(text, ' ')) - 5),
             j -> array_join(slice(split(text, ' '), j + 1, 5), ' '))
           ELSE array() END""")).as("sh"))
      .distinct()
    time("gram distinct")(g.count())
    import org.apache.spark.sql.expressions.Window
    val wK = Window.partitionBy("source").orderBy("h")
    time("kmv branch (hash+topk)") {
      g.select(col("source"), xxhash64(col("sh")).as("h"))
        .withColumn("rk", row_number().over(wK)).filter(col("rk") <= 1000)
        .groupBy("source").agg(sort_array(collect_list(col("h"))).as("hs"))
        .count()
    }
    time("exact inter branch") {
      g.groupBy("sh").agg(collect_set(col("source")).as("ss"))
        .filter(size(col("ss")) >= 2).count()
    }
    time("full query")(graft.SparkEntry.queries("tx_source_overlap_kmv")(spark, sfDir).count())
    spark.stop()
  }
}
