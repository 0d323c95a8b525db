package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every module's oracle-checked entries
  * (SURVEY.md §2 inventory); `oracleSql` carries the matching DuckDB
  * SQL for hash-compare at sf0.01.
  */
object SparkEntry {

  private def modules: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    analytics.Queries.entries ++
      events.EventOps.entries ++
      text.TextOps.entries ++
      dedup.DedupOps.entries ++
      ann.AnnOps.entries ++
      multimodal.MultimodalOps.entries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q5_supplier_volume")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map { case (name, fn, _) => name -> fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (LSH/minhash internals) → driver records a rows-only check.
    */
  def oracleSql: Map[String, String] =
    modules.collect { case (name, _, Some(sql)) => name -> sql.trim }.toMap
}
