package graft.tools

/** Min-of-3 sf1 walls for the round-12 operator tranche (weak-set
  * preemption: every new row measured against its DuckDB sf1 oracle
  * wall before the round ships).
  */
object ProfNewR12 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val spark = graft.Graft.session("graft-prof-new-r12")
    Seq("ann_graph_search", "mm_phash_neardup", "tx_split_kl",
      "q_unpivot", "ann_vector_audit", "tx_bm25_search",
      "pipeline_dedup_cascade", "tx_pmi_collocations",
      "q_percentile_cont", "mm_vad_segments", "ev_pagerank_types", "tx_ndcg_eval", "q_trailing_spend", "tx_bpe_fertility", "tx_epoch_plan", "pipeline_media_ingest").foreach { q =>
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
