package graft

/** CLI entry: run any named query from SparkEntry against a scale dir.
  *
  *   sbt "runMain graft.Run q1_pricing_summary /root/testdata/sf0.001"
  *   sbt "runMain graft.Run --list"
  */
object Run {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty || args(0) == "--list") {
      SparkEntry.queries.keys.toSeq.sorted.foreach(println)
      return
    }
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name' — use --list"))
    val spark = Graft.session(s"graft-$name")
    try {
      val df = fn(spark, sfDir)
      df.show(50, truncate = false)
      println(s"[graft] $name rows=${df.count()}")
    } finally spark.stop()
  }
}
