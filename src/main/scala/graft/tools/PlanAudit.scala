package graft.tools

/** Plan-shape audit for changed queries (disposable; run manually). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.Graft.session("graft-audit")
    Seq("dd_components", "ann_kmeans", "dd_incremental", "tx_pii_redact",
      "tx_entropy", "dd_simhash_planted", "ann_lsh_planted", "ann_ivf_planted",
      "tx_source_cap", "tx_chunks",
      "tx_seqpack", "ann_quantize", "tx_quality_buckets", "ev_rate_spike",
      "tx_bigram_surprisal", "dd_cdc_chunks", "ann_pq", "ann_pq_adc", "pipeline_pretrain_mix", "ann_ivf_pq", "tx_ngram_novelty",
      "q8_market_share", "q10_returned_items", "q15_top_supplier",
      "q22_sales_opportunity", "tx_epoch_shuffle", "pipeline_corpus_card",
      "mm_pair_filter", "ev_trace_decode", "dd_span_dedup", "dd_span_trim",
      "ann_range", "q9_product_profit", "q11_important_parts",
      "q16_part_suppliers", "q20_surplus_suppliers",
      "dd_simhash", "tx_ngram_profile", "tx_token_shards", "tx_kn_surprisal",
      "ev_filter_meta_typed", "q21_waiting_supplier", "q_running_total",
      "tx_winnow", "dd_winnow_pairs", "tx_bloom_decontaminate",
      "dd_containment", "tx_linear_score", "ann_rerank_stub",
      "ev_gapfill_daily",
      "tx_bpe_merges", "tx_bpe_tokens", "dd_cluster_keep_best",
      "tx_readability", "ev_lateness", "mm_mime_sniff",
      "ev_concurrency", "ev_type_ngrams", "ev_key_skew", "ev_rfm_segments",
      "q_equidepth", "q_zorder", "tx_boilerplate", "pipeline_snapshot_diff",
      "dd_bloom_incremental", "dd_soft_weights", "pipeline_sft_pairs",
      "mm_res_filter", "ann_recall_report", "ann_opq_permute",
      "ann_mrl_report", "ev_conversion_window", "q_mv_incremental",
      "ann_drift_report", "tx_length_quantiles", "pipeline_doremi_mix",
      "ev_k_anonymity", "ev_ab_report", "dd_threshold_curve",
      "ev_trending", "ev_backfill_plan",
      "ann_hard_negatives", "mm_dedup_bytes", "ev_ttl_expire",
      "ev_watermark_report", "q_encoding_audit", "q_zorder_files",
      "ev_cohort_matrix", "ev_anomaly_days", "ann_knn_classifier",
      "dd_cluster_sizes", "tx_lang_confusion", "q_analyze_stats",
      "ev_funnel_paths", "ev_seasonality", "q_fk_audit", "ann_silhouette",
      "ev_type_affinity", "ev_power_users").foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      df.collect() // materialize THIS frame so AQE reports the FINAL plan (a count() would plan separately)
      val plan = df.queryExecution.executedPlan.toString
      println(s"===== $q =====")
      println(s"  broadcasts: ${plan.linesIterator.count(_.contains("BroadcastExchange"))}")
      println(s"  shuffles:   ${plan.linesIterator.count(_.contains("Exchange hashpartitioning"))}")
      println(s"  singlePart: ${plan.linesIterator.count(_.contains("Exchange SinglePartition"))}")
      println(s"  topKNodes:  ${plan.linesIterator.count(_.contains("TopKPerKey"))}")
      // codegen stages appear as "*(n)" operator prefixes in tree strings
      val cg = """\*\((\d+)\)""".r.findAllMatchIn(plan).map(_.group(1)).toSet
      println(s"  wscodegen:  ${cg.size}")
      plan.linesIterator.filter(l => l.contains("PushedFilters: [") && !l.contains("PushedFilters: []"))
        .take(3).foreach(l => println("  pushed: " + l.trim.take(140)))
    }
    spark.stop()
  }
}
