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

  test("ev_lateness and ev_rfm_segments: forced range path == broadcast path") {
    val sf = TestSpark.sf
    val key = graft.GraftConf.PrefixBroadcastMaxRows.key
    def run(q: String): Seq[String] =
      graft.SparkEntry.queries(q)(spark, sf)
        .collect().map(_.toString).toSeq
    val broadcastPath = Seq("ev_lateness", "ev_rfm_segments").map(q => q -> run(q)).toMap
    spark.conf.set(key, "0") // every frame is now "too big" to broadcast
    try {
      broadcastPath.foreach { case (q, expected) =>
        assert(run(q) === expected, s"$q: range path diverged from broadcast path")
      }
    } finally spark.conf.unset(key)
  }
}
