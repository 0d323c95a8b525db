package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Defaults are chosen for correctness-first local runs but scale to a
  * real cluster: AQE enabled (runtime coalesce + skew-join handling),
  * UTC session time, modest shuffle parallelism locally (the driver
  * overrides via `SPARK_GRAFT_CPUS` on bigger machines).
  */
object Graft {
  /** Executor threads: SPARK_GRAFT_CPUS if set, else every available
    * core (capped at 32 — the target single-node shape). The previous
    * default of 4 silently ran benches at 1/8 of the machine while
    * the DuckDB baseline used all cores.
    */
  def defaultCpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS",
    math.min(32, Runtime.getRuntime.availableProcessors()).toString)

  def session(appName: String = "graft",
      master: String = s"local[$defaultCpus]",
      extraConfs: Map[String, String] = Map.empty): SparkSession = {
    val cpus = defaultCpus
    val builder = SparkSession.builder()
    extraConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder
      .appName(appName)
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // parallelismFirst stays at its default (true): r17 measured the
      // size-based alternative (false, advisory 64 MB) serializing
      // every 1-64 MB shuffle to ONE reduce task — the TPC-H join
      // cluster regressed 3-4x at sf0.1 (q5 0.6 -> 2.7 s) for no gain
      // elsewhere, since the default's 1 MB minPartitionSize already
      // coalesces the genuinely tiny stages.
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // minPartitionSize stays at its default (1m): r17 measured 128k
      // fleet-wide and it regressed the tail hard (every 1-2-exchange
      // query +0.05-0.15 s from 32-task scheduling where 1-3 tasks
      // carried the bytes, ev_gaps 0.41 -> 2.67 s) without helping the
      // CPU-dense targets it was meant for — those get explicit
      // repartition pins instead.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Producers write timestamp[us] with isAdjustedToUTC=false; default
      // NTZ inference would surface those as TIMESTAMP_NTZ and break
      // typed Timestamp paths. Read them as session-TZ (UTC) timestamps.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // rank-filter → TopKPerKey bounded-heap rewrite, on by default for
    // every graft session (kill-switch: spark.graft.topk.rewrite=false)
    plans.TopKPerKeyOps.enableRewrite(spark)
    spark
  }
}
