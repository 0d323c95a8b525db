package graft.util

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The hybrid prefix-scan operators are checked-bounded: at test SF
  * they take the window+broadcast path, so the range-partitioned
  * scale path would ship untested without this spec — it forces the
  * scale path via spark.graft.prefix.broadcastMaxRows=0 and pins
  * bit-identical results, plus unit-pins Prefix.rangeCumMax itself.
  */
class PrefixSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("rangeCumMax: exclusive prefix maximum, null for the first key") {
    import spark.implicits._
    val df = Seq((5L, 10L), (1L, 7L), (3L, 2L), (9L, 8L), (7L, 11L))
      .toDF("k", "v")
    val got = Prefix.rangeCumMax(spark, df, "k", "v")
      .orderBy("k")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toSeq
    assert(got === Seq(
      (1L, 7L, None),        // first key: no predecessor
      (3L, 2L, Some(7L)),
      (5L, 10L, Some(7L)),
      (7L, 11L, Some(10L)),
      (9L, 8L, Some(11L))))
  }

  test("every cumExcl operator: forced range path == broadcast path") {
    val sf = TestSpark.sf
    val key = graft.GraftConf.PrefixBroadcastMaxRows.key
    def run(q: String): Seq[String] =
      graft.SparkEntry.queries(q)(spark, sf)
        .collect().map(_.toString).toSeq
    val qs = Seq("ev_lateness", "ev_rfm_segments", "ev_disorder",
      "ev_backfill_plan", "ev_watermark_report", "ev_gaps", "tx_token_shards")
    val broadcastPath = qs.map(q => q -> run(q)).toMap
    spark.conf.set(key, "0") // every frame is now "too big" to broadcast
    try {
      broadcastPath.foreach { case (q, expected) =>
        assert(run(q) === expected, s"$q: range path diverged from broadcast path")
      }
    } finally spark.conf.unset(key)
  }

  test("cumExcl: sum form zero-bases the first key; max form nulls it") {
    import spark.implicits._
    val df = Seq((2L, 4L), (1L, 3L), (3L, 5L)).toDF("k", "v")
    val (sumPfx, smallS) = Prefix.cumExcl(spark, df, "k", "v", "sum")
    assert(smallS)
    assert(sumPfx.orderBy("k").collect().map(_.getLong(2)).toSeq === Seq(0L, 3L, 7L))
    val (maxPfx, _) = Prefix.cumExcl(spark, df, "k", "v", "max")
    val got = maxPfx.orderBy("k").collect()
      .map(r => if (r.isNullAt(2)) None else Some(r.getLong(2))).toSeq
    assert(got === Seq(None, Some(3L), Some(4L)))
    // forced range path agrees on both forms
    spark.conf.set(graft.GraftConf.PrefixBroadcastMaxRows.key, "0")
    try {
      val (rs, smallR) = Prefix.cumExcl(spark, df, "k", "v", "sum")
      assert(!smallR)
      assert(rs.orderBy("k").collect().map(_.getLong(2)).toSeq === Seq(0L, 3L, 7L))
      val (rm, _) = Prefix.cumExcl(spark, df, "k", "v", "max")
      val gotR = rm.orderBy("k").collect()
        .map(r => if (r.isNullAt(2)) None else Some(r.getLong(2))).toSeq
      assert(gotR === Seq(None, Some(3L), Some(4L)))
    } finally spark.conf.unset(graft.GraftConf.PrefixBroadcastMaxRows.key)
  }
}
