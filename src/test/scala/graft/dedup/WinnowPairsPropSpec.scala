package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import graft.text.TextOps

/** Pins the relational half of the winnow-overlap path (60-bit key
  * narrowing → capped bucket collect → i<j explosion → multiplicity
  * count) against an in-memory reference over the SAME fingerprint
  * frame — the doc-local selection kernel itself is pinned separately
  * (WinnowSpec vs brute force). Includes a >cap clone group, so the
  * overflow-drop contract (collect cap+1 → BETWEEN guard rejects) is
  * exercised, and cross-group incidental sharing from a small
  * vocabulary.
  */
class WinnowPairsPropSpec extends AnyFunSuite {

  test("winnowCandidatePairs equals the brute-force reference (incl. cap overflow)") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val words = Array("spark", "join", "filter", "window", "agg", "scan",
      "merge", "sort", "batch", "stream")
    def text(seed: Int): String = {
      val r = new scala.util.Random(seed)
      (1 to 40).map(_ => words(r.nextInt(words.length))).mkString(" ")
    }
    // groups of identical docs: sizes 3 and 5 pair up; 55 overflows
    // the cap and must contribute nothing; 20 singletons may share
    // fingerprints incidentally (tiny vocabulary)
    var id = -1L
    val docs = Seq(3, 5, 55).zipWithIndex.flatMap { case (n, g) =>
      val t = text(1000 + g)
      (1 to n).map { _ => id += 1; (id, t) }
    } ++ (1 to 20).map { i => id += 1; (id, text(i)) }
    val df = docs.toDF("doc_id", "text")

    val got = winnowPairsOf(df)

    // reference over the same fingerprint frame
    val fps = TextOps.winnowFingerprints(spark, df, 20, 8).collect()
      .map { case (d, fp) => (d, java.lang.Long.parseUnsignedLong(fp.take(15), 16)) }
    val byFp = fps.groupBy(_._2).view.mapValues(_.map(_._1).distinct.sorted).toMap
    val counts = scala.collection.mutable.Map.empty[(Long, Long), Long]
    byFp.values.foreach { ds =>
      if (ds.length >= 2 && ds.length <= 50)
        for (i <- ds.indices; j <- i + 1 until ds.length)
          counts((ds(i), ds(j))) = counts.getOrElse((ds(i), ds(j)), 0L) + 1L
    }
    val want = counts.filter(_._2 >= 2L).toMap

    assert(got == want)
    // the 55-clone group must be invisible (every one of its
    // fingerprints overflowed the cap)
    val cloneIds = (8L until 63L)
    assert(!got.keys.exists { case (a, b) =>
      cloneIds.contains(a) && cloneIds.contains(b) })
    // the 3- and 5-groups must pair completely
    assert(got.keySet.count { case (a, b) => a < 3 && b < 3 } == 3)
    assert(got.keySet.count { case (a, b) => (3L to 7L).contains(a) &&
      (3L to 7L).contains(b) } == 10)
  }

  private def winnowPairsOf(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Long] =
    DedupOps.winnowCandidatePairs(df.sparkSession, df)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
}
