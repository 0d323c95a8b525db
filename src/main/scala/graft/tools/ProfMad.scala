package graft.tools
object ProfMad {
  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.session("graft-prof-mad")
    val runs = (1 to 4).map { _ =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("ev_mad_outliers")(spark, "/tmp/sf1").count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"PROF ev_mad_outliers sf1 min=${runs.min}%6.3f runs=${runs.map(r => f"$r%.2f").mkString(",")}")
    spark.stop()
  }
}
