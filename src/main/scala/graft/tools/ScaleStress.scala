package graft.tools

import org.apache.spark.sql.functions._

/** N× scale stress for the pipeline operators: replicate the corpus
  * tables with shifted ids, run each heavy query at 1× and N× in the
  * same session, and report the wall ratio. A healthy (linear)
  * operator stays at or below the replication factor; anything
  * super-linear is a quadratic-blowup regression.
  *
  * Probe-bounded queries (ann_*, dd_ngram_jaccard) keep their probe
  * sets fixed (ids < bound stay un-replicated), so their ratios
  * reflect corpus-side scaling only — the 100 TB access pattern.
  */
object ScaleStress {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_STRESS_X", "10").toInt
    val out = java.nio.file.Files.createTempDirectory("graft-stress").toString
    val spark = graft.Graft.session("graft-stress")
    val reps = broadcast(spark.range(factor).select(col("id").as("rep")))

    spark.read.parquet(s"$base/documents.parquet").crossJoin(reps)
      .withColumn("doc_id", col("doc_id") + col("rep") * 10000000L)
      .drop("rep")
      .write.parquet(s"$out/documents.parquet")
    spark.read.parquet(s"$base/embeddings.parquet").crossJoin(reps)
      .withColumn("vec_id", col("vec_id") + col("rep") * 10000000L)
      .drop("rep")
      .write.parquet(s"$out/embeddings.parquet")
    // events replicate with shifted ids AND users (the per-user window
    // partitioning must not collapse under replication); event time is
    // left as-is, so the id-ordered prefix patterns see N× density
    spark.read.parquet(s"$base/events.parquet").crossJoin(reps)
      .withColumn("event_id", col("event_id") + col("rep") * 100000000L)
      .withColumn("user_id", col("user_id") + col("rep") * 10000000L)
      .drop("rep")
      .write.parquet(s"$out/events.parquet")
    // lineitem replicates with shifted orderkeys so the relational
    // stress rows (grouping sets) see N× fact rows, not N× duplicates
    // of the same key space collapsing into one group
    spark.read.parquet(s"$base/lineitem.parquet").crossJoin(reps)
      .withColumn("l_orderkey", col("l_orderkey") + col("rep") * 100000000L)
      .drop("rep")
      .write.parquet(s"$out/lineitem.parquet")
    // orders replicates the same stride (q_mv_incremental et al.)
    spark.read.parquet(s"$base/orders.parquet").crossJoin(reps)
      .withColumn("o_orderkey", col("o_orderkey") + col("rep") * 100000000L)
      .withColumn("o_custkey", col("o_custkey") + col("rep") * 10000000L)
      .drop("rep")
      .write.parquet(s"$out/orders.parquet")

    // dims pass through unreplicated (q_fk_audit's parent-key sets;
    // replicated orders/custkeys going orphan vs the 1x dims is fine
    // for a WALL-ratio stress — every row still scans and joins)
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      spark.read.parquet(s"$base/$t.parquet").write.parquet(s"$out/$t.parquet")
    }

    val defaultList = Seq(
      "dd_exact", "dd_minhash_lsh", "dd_simhash", "dd_ngram_jaccard",
      "dd_semantic", "ann_lsh", "ann_ivf", "ann_bruteforce",
      "ann_graph_search",
      "tx_ngram_profile", "tx_decontaminate", "tx_token_shards",
      "tx_tfidf", "tx_heavy_hitters", "tx_source_mix",
      "pipeline_prepare_corpus",
      "dd_components", "ann_kmeans", "dd_incremental", "tx_pii_redact",
      "tx_entropy", "tx_bigram_surprisal", "tx_chunks", "tx_source_cap",
      "ev_disorder", "ev_sessionize", "ev_latest_state", "ev_active_users",
      "tx_seqpack", "ann_quantize", "tx_quality_buckets", "ev_rate_spike",
      "dd_cdc_chunks", "ann_pq", "ann_pq_adc", "pipeline_pretrain_mix", "ann_ivf_pq", "tx_ngram_novelty",
      "dd_span_dedup", "dd_span_trim", "ann_range",
      "tx_temperature_mix", "tx_contam_leakage", "tx_kn_surprisal",
      "tx_winnow", "dd_winnow_pairs", "dd_containment",
      "tx_bloom_decontaminate", "tx_linear_score", "ann_rerank_stub",
      "ev_gapfill_daily", "q_grouping_sets", "tx_bpe_merges", "tx_bpe_tokens")
    // SPARK_GRAFT_STRESS_QUERIES=a,b,c restricts the sweep — the deep
    // (100x) stress targets only the scale-critical tier, where a full
    // sweep would spend most wall on already-proved cheap operators
    val stressed = sys.env.get("SPARK_GRAFT_STRESS_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(defaultList)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val loadStart = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    var worst = ("", 0.0)
    val results = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Double, Double)]
    stressed.foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      val t1 = time(fn(spark, base).count())
      val tN = time(fn(spark, out).count())
      val ratio = tN / t1
      results(q) = (t1, tN, ratio)
      if (ratio > worst._2) worst = (q, ratio)
      println(f"[stress] $q%-24s 1x=$t1%6.2fs ${factor}x=$tN%7.2fs ratio=$ratio%5.1f")
    }
    println(f"[stress] worst ratio: ${worst._1} at ${worst._2}%.1fx (replication ${factor}x)")
    // one committed artifact per round (verdict r10 item #10): the
    // wall-ratio evidence lives in git, not in commit messages
    sys.env.get("SPARK_GRAFT_STRESS_OUT").foreach { path =>
      val rows = results.map { case (q, (t1, tN, r)) =>
        f"""    "$q": {"t1_s": $t1%.3f, "tN_s": $tN%.3f, "wall_ratio": $r%.2f}"""
      }.mkString(",\n")
      val json =
        f"""{
  "replication": $factor,
  "base": "$base",
  "load_avg_start": $loadStart%.2f,
  "worst": {"query": "${worst._1}", "wall_ratio": ${worst._2}%.2f},
  "queries": {
$rows
  }
}
"""
      java.nio.file.Files.write(java.nio.file.Paths.get(path),
        json.getBytes("UTF-8"))
      println(s"[stress] wrote $path")
    }
    spark.stop()
  }
}
