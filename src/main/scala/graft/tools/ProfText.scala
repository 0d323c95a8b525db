package graft.tools

import org.apache.spark.sql.functions._

/** Stage-level timing probe for the text tier (disposable). */
object ProfText {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val spark = graft.Graft.session("graft-prof-text")
    import spark.implicits._
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = graft.Tables.documents(spark, d)
    t("docs text scan") { docs.select(col("text")).count() }
    t("docs text scan warm") { docs.select(length(col("text"))).agg(sum("length(text)")).collect() }
    t("normalize (catalyst regex)") {
      docs.select(length(graft.text.TextOps.normalize(col("text"))).as("l"))
        .agg(sum("l")).collect()
    }
    t("normalize warm") {
      docs.select(length(graft.text.TextOps.normalize(col("text"))).as("l"))
        .agg(sum("l")).collect()
    }
    t("tokens size") {
      docs.select(size(graft.text.TextOps.tokens(col("text"))).as("n"))
        .agg(sum("n")).collect()
    }
    t("typed pass-through") {
      docs.select(col("lang"), col("text")).as[(String, String)]
        .mapPartitions(it => Iterator.single(it.map { case (_, s) => if (s == null) 0 else s.length }.sum))
        .reduce(_ + _)
    }
    t("full tx_ngram_profile 1") {
      graft.SparkEntry.queries("tx_ngram_profile")(spark, d).count()
    }
    t("full tx_ngram_profile 2") {
      graft.SparkEntry.queries("tx_ngram_profile")(spark, d).count()
    }
    t("full tx_token_shards 1") {
      graft.SparkEntry.queries("tx_token_shards")(spark, d).count()
    }
    t("full tx_token_shards 2") {
      graft.SparkEntry.queries("tx_token_shards")(spark, d).count()
    }
    // decomposition of tx_token_shards
    val docsDf = graft.Tables.documents(spark, d)
    t("tokcount typed map") {
      docsDf.select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, text) => (id, graft.text.TextOps.tokenCountLocal(text)) }
        .toDF("doc_id", "n_tok").agg(sum("n_tok")).collect()
    }
    t("tokcount typed map warm") {
      docsDf.select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, text) => (id, graft.text.TextOps.tokenCountLocal(text)) }
        .toDF("doc_id", "n_tok").agg(sum("n_tok")).collect()
    }
    val tchk = t("narrow frame + localCheckpoint") {
      docsDf.select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, text) => (id, graft.text.TextOps.tokenCountLocal(text)) }
        .toDF("doc_id", "n_tok")
        .select(col("doc_id"), col("n_tok").cast("int").as("n_tok"))
        .withColumn("blk", call_function("div", col("doc_id"), lit(4096L)))
        .localCheckpoint()
    }
    t("downstream windows+join+agg") {
      val local = org.apache.spark.sql.expressions.Window.partitionBy("blk").orderBy("doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val offW = org.apache.spark.sql.expressions.Window.orderBy("blk")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val offsets = tchk.groupBy("blk").agg(sum("n_tok").as("btot"))
        .withColumn("off", coalesce(sum("btot").over(offW), lit(0L)))
        .select("blk", "off")
      tchk.withColumn("lcum", sum("n_tok").over(local))
        .join(broadcast(offsets), "blk")
        .withColumn("cum", col("lcum") + col("off"))
        .withColumn("shard", ((col("cum") - 1) / 5000).cast("long"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").cast("long").as("shard_tokens"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
        .orderBy("shard").count()
    }
    spark.stop()
  }
}
