package graft.tools

/** Time a subset of SparkEntry.queries (min of 2 runs after the same
  * table warmup Bench uses) — the per-query iteration loop, so a perf
  * pass on one operator doesn't pay a full bench sweep.
  *
  * Usage: runMain graft.tools.TimeQuery <sfDir> <query>[,<query>...]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args.take(2)
    val spark = graft.Graft.session("graft-timequery")
    Seq("lineitem", "events", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").count()
    }
    names.split(",").foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val runs = sys.env.get("SPARK_GRAFT_TIME_RUNS").map(_.toInt).getOrElse(2)
      val t = (1 to runs).map(_ => once()).min
      println(f"TIME $name%-28s $t%8.3f s")
    }
    spark.stop()
  }
}
