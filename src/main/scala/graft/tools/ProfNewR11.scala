package graft.tools

/** Min-of-3 sf1 walls for the round-11 operator tranche (weak-set
  * preemption: every new row measured against its DuckDB sf1 oracle
  * wall before the round ships).
  */
object ProfNewR11 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val spark = graft.Graft.session("graft-prof-new-r11")
    Seq("ev_heartbeat_gaps", "ev_time_weighted", "ev_range_join",
      "ev_scd2_dimension", "tx_line_dedup", "tx_gopher_rules",
      "tx_source_overlap", "ann_mmr_rerank").foreach { q =>
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROF $q%-24s min=${runs.min}%6.3f s runs=${runs.map(r => f"$r%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
