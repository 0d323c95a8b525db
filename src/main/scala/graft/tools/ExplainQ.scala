package graft.tools
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args.take(2)
    val spark = graft.Graft.session("graft-explain")
    names.split(",").foreach { n =>
      println(s"==== $n")
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      df.count() // let AQE finalize
      println(df.queryExecution.executedPlan.toString.take(40000))
    }
    spark.stop()
  }
}
