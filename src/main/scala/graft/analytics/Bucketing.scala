package graft.analytics

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed tables for co-located joins (SURVEY.md §5): writing both
  * fact tables bucketed+sorted on the join key means repeated joins
  * read pre-partitioned data — SortMergeJoin with NO shuffle exchange
  * on either side. At 100 TB this converts every recurring fact-fact
  * join from a full network shuffle into a local merge.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key. */
  def bucketedJoin(spark: org.apache.spark.sql.SparkSession,
      leftTable: String, rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
