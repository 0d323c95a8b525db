package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** An empty corpus is a legitimate input at 100 TB (a fresh ingest
  * partition, a filter that drops everything): every documents-table
  * pipeline query must plan and return an EMPTY frame, never throw.
  * Covers the typed kernels (flatMap over zero rows), the vocabulary
  * orderBy/limit over an empty frame, the bloom scalar subquery over
  * an empty relation, and the capped bucket-pair machinery.
  */
class EmptyCorpusSpec extends AnyFunSuite {

  private val docQueries = Seq(
    "dd_exact", "tx_winnow", "dd_winnow_pairs", "dd_containment",
    "tx_linear_score", "tx_quality", "tx_tokens", "tx_fingerprint",
    "dd_ngram_jaccard", "tx_entropy", "pipeline_prepare_corpus",
    "tx_decontaminate", "tx_bloom_decontaminate",
    // round-9 additions: cluster labeling (CC over zero edges +
    // anti-join), readability/span-corruption projections, BPE learn
    // over an empty vocab, magic-byte sniff, preference pairs
    "dd_cluster_keep_best", "tx_readability", "tx_span_corrupt",
    "tx_bpe_merges", "tx_bpe_tokens", "mm_mime_sniff",
    "pipeline_pref_pairs",
    // second round-9 tranche: template detection, snapshot diff,
    // bloom-pruned incremental dedup (bloom agg over an empty
    // relation), resolution gate
    "tx_boilerplate", "pipeline_snapshot_diff", "dd_bloom_incremental",
    "mm_res_filter", "dd_soft_weights", "pipeline_sft_pairs",
    "tx_length_quantiles", "pipeline_doremi_mix", "dd_threshold_curve",
    // round-10: binary payload dedup, dup-cluster histogram, lang
    // confusion
    "mm_dedup_bytes", "dd_cluster_sizes", "tx_lang_confusion",
    // round-12: split-KL over an empty vocab, phash banding over zero
    // payloads
    "tx_split_kl", "mm_phash_neardup", "tx_bm25_search",
    "tx_pmi_collocations", "mm_vad_segments", "tx_ndcg_eval",
    "tx_epoch_plan", "pipeline_media_ingest", "tx_bpe_fertility")

  test("documents-table queries return empty frames on an empty corpus") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-empty").toString
    // the same schema the driver's testdata carries
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    docQueries.foreach { q =>
      val n = graft.SparkEntry.queries(q)(spark, dir).count()
      assert(n == 0L, s"$q returned $n rows on an empty corpus")
    }
    // global-aggregate report: the cascade emits its 3 stage rows
    // (all-zero counts) on an empty corpus, same as its SQL oracle
    val cascade = graft.SparkEntry.queries("pipeline_dedup_cascade")(spark, dir).collect()
    assert(cascade.length == 3 && cascade.forall(_.getAs[Long]("docs_in") == 0L))
  }

  test("event queries return empty frames on an empty log") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-emptyev").toString
    Seq.empty[(Long, java.sql.Timestamp, Long, String, Double, String)]
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    Seq("ev_model", "ev_sessionize", "ev_latest_state", "ev_gaps",
      "ev_window_count", "ev_lateness", "ev_inter_event_time",
      "ev_gapfill_daily", "ev_concurrency", "ev_type_ngrams",
      "ev_key_skew", "ev_rfm_segments", "ev_conversion_window",
      "ev_trending", "ev_backfill_plan",
      // round-10: lifecycle, watermark tuning, cohorts, anomalies
      "ev_ttl_expire", "ev_watermark_report", "ev_cohort_matrix",
      "ev_anomaly_days",
      // round-10b: sequence mining, seasonality profile, affinity
      "ev_funnel_paths", "ev_seasonality", "ev_type_affinity",
      // round-12: pagerank over an empty type graph
      "ev_pagerank_types").foreach { q =>
      val n = graft.SparkEntry.queries(q)(spark, dir).count()
      assert(n == 0L, s"$q returned $n rows on an empty log")
    }
    // global (no-groupBy) aggregates correctly return their single
    // zero row on empty input — same as their SQL oracles
    Seq("ev_dedup_ids", "ev_funnel").foreach { q =>
      val r = graft.SparkEntry.queries(q)(spark, dir).collect()
      assert(r.length == 1 && r(0).getLong(0) == 0L,
        s"$q should return one zero row on an empty log")
    }
  }

  test("embedding queries return empty frames on an empty table") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-emptyemb").toString
    Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Seq("ann_opq_permute", "ann_recall_report", "ann_mrl_report",
      "ann_drift_report", "ann_hard_negatives", "ann_knn_classifier",
      "ann_silhouette",
      // round-12: graph walk over an empty pivot layer, hygiene audit
      "ann_graph_search", "ann_vector_audit").foreach { q =>
      val n = graft.SparkEntry.queries(q)(spark, dir).count()
      assert(n == 0L, s"$q returned $n rows on an empty table")
    }
  }
}
