package graft.tools

import org.apache.spark.sql.functions._

/** One-off stage/round profile for dd_cluster_keep_best at an SF dir. */
object ProfCluster {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf1")
    val spark = graft.Graft.session("graft-profcluster")
    val docs = graft.Tables.documents(spark, d)
    docs.count()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label%-24s ${(System.nanoTime()-t0)/1e9}%8.3f s"); r
    }
    val edges = graft.dedup.DedupOps.winnowCandidatePairs(spark, docs)
      .select(col("a").as("src"), col("b").as("dst"))
    // replicate ConnectedComponents round structure with timing
    var und = time("und build+ckpt") {
      edges
        .select(explode(array(
          struct(col("src").as("src"), col("dst").as("dst")),
          struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
        .localCheckpoint()
    }
    var mapping = time("mapping init") {
      und.select(col("src").as("v")).distinct()
        .withColumn("component", col("v")).localCheckpoint()
    }
    var n = und.count()
    var iter = 0
    while (iter < 20 && n > 0) {
      val l = time(s"round$iter label") {
        und.groupBy("src").agg(min(col("dst")).as("m"))
          .select(col("src").as("lv"), least(col("src"), col("m")).as("lc"))
          .localCheckpoint()
      }
      mapping = time(s"round$iter compose") {
        mapping.join(l, mapping("component") === l("lv"), "left")
          .select(mapping("v"), coalesce(col("lc"), mapping("component")).as("component"))
          .localCheckpoint()
      }
      und = time(s"round$iter contract") {
        und.join(l, und("src") === l("lv"))
          .select(col("lc").as("csrc"), col("dst"))
          .join(l.select(col("lv").as("dv"), col("lc").as("cdst")), col("dst") === col("dv"))
          .select(col("csrc").as("src"), col("cdst").as("dst"))
          .filter(col("src") =!= col("dst")).distinct().localCheckpoint()
      }
      n = und.count()
      println(s"  round$iter edges -> $n")
      iter += 1
    }
    spark.stop()
  }
}
