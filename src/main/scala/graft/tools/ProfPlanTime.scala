package graft.tools

/** Split a query's wall into (build, plan, execute): DataFrame
  * construction (driver collects + expression-tree building), Catalyst
  * analysis/optimization/physical planning, and the actual run. Tells
  * a planning/codegen floor apart from a data-path cost — the "driver
  * gap" ProfJobs reports is the sum of the first two plus per-stage
  * re-planning.
  *
  * Usage: runMain graft.tools.ProfPlanTime <sfDir> <query>[,<query>...]
  */
object ProfPlanTime {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args.take(2)
    val spark = graft.Graft.session("graft-profplantime")
    Seq("lineitem", "events", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").count()
    }
    names.split(",").foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // warm run: JIT + codegen cache
      fn(spark, sfDir).count()
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimize+plan
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        println(f"PLANTIME $name%-26s rep$rep build=${(t1 - t0) / 1e9}%6.3f plan=${(t2 - t1) / 1e9}%6.3f exec=${(t3 - t2) / 1e9}%6.3f total=${(t3 - t0) / 1e9}%6.3f")
      }
    }
    spark.stop()
  }
}
