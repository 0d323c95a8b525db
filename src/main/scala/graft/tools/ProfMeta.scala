package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** r16 scratch profiler (r15 verdict item 3): where does
  * ev_filter_meta's 29x-vs-oracle sf1 wall come from, and does a
  * different one-parse form (from_json with an explicit schema,
  * json_tuple, or a jsonb-free substring kernel) beat
  * get_json_object? Run on /tmp/sf1. The scale-safe answer is A7b's
  * write-once typed column either way; this settles the read-path
  * FALLBACK the way ProfHamming settled the Hamming floor.
  */
object ProfMeta {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf1")
    val spark = graft.Graft.session("prof-meta")
    val ev = spark.read.parquet(s"$d/events.parquet")
      .select(col("event_type"), col("value"), col("props"))
    ev.count() // warm page cache

    def time(label: String)(f: => Long): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"PROF $label%-28s ${runs.map(_._1).min}%7.3f s  rows=${runs.head._2}")
    }

    def aggOf(k: org.apache.spark.sql.Column): Long =
      ev.withColumn("k", k)
        .filter(col("k") % 10 === 0 && col("k") < 50)
        .groupBy("event_type")
        .agg(count(lit(1)), sum(round(col("value") * 100).cast("long")))
        .count()

    time("scan_only")(ev.count())
    time("scan_props_len")(ev.select(sum(length(col("props")))).count())
    time("get_json_object")(
      aggOf(get_json_object(col("props"), "$.k").cast("int")))
    val sch = StructType(Seq(StructField("k", IntegerType)))
    time("from_json_schema")(
      aggOf(from_json(col("props"), sch).getField("k")))
    time("json_tuple")(
      ev.select(col("event_type"), col("value"),
          json_tuple(col("props"), "k").as("ks"))
        .withColumn("k", col("ks").cast("int"))
        .filter(col("k") % 10 === 0 && col("k") < 50)
        .groupBy("event_type")
        .agg(count(lit(1)), sum(round(col("value") * 100).cast("long")))
        .count())
    // regex single-capture: no JSON parser at all — valid only for the
    // flat {"k": N, ...} shapes the log writes; measures the parser's
    // share of the wall rather than proposing an operator
    time("regexp_extract")(
      aggOf(regexp_extract(col("props"), "\"k\"\\s*:\\s*(-?\\d+)", 1).cast("int")))
    spark.stop()
  }
}
