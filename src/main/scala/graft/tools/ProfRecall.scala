package graft.tools

/** r17 scratch: print the planted-clone recall of each approximate
  * ANN path (the bench's ann.* metrics) without a full bench sweep.
  * Usage: runMain graft.tools.ProfRecall [sfDir]
  */
object ProfRecall {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Graft.session("prof-recall")
    Seq("ann_graph_search", "ann_lsh", "ann_ivf", "ann_pq_adc").foreach { q =>
      val r = graft.ann.AnnOps.plantedCloneRecall(spark, d,
        graft.SparkEntry.queries(q))
      println(f"RECALL $q%-18s $r%.4f")
    }
    spark.stop()
  }
}
