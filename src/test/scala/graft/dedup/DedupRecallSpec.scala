package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Quality proof for the LSH path: on a corpus with PLANTED
  * near-duplicates (small perturbations of real docs), banded MinHash
  * must surface the planted pairs — the synthetic test tables carry no
  * true near-dups, so this is the recall evidence the oracle can't
  * give.
  */
class DedupRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("minhash LSH recalls planted near-duplicates with high jaccard") {
    import spark.implicits._
    val base = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().take(50)

    // plant: copy each doc with a tiny perturbation (drop last word,
    // tweak punctuation) — jaccard on char-4-grams stays high
    val planted = base.map { case (id, text) =>
      val words = text.split(" ")
      (id + 100000L, words.dropRight(1).mkString(" ") + " zz")
    }
    val corpus = (base ++ planted).toSeq.toDF("doc_id", "text")

    val pairs = DedupOps.minhashPairs(corpus)
      .filter(col("jaccard") >= 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val expected = base.map { case (id, _) => (id, id + 100000L) }.toSet
    val recalled = expected.count(pairs.contains)
    // banding (4 bands × 8 rows) keeps near-identical docs together
    assert(recalled >= (expected.size * 0.9).toInt,
      s"recalled only $recalled of ${expected.size} planted pairs")
    // and the pair list is not flooded with false positives
    assert(pairs.size <= expected.size * 3)
  }

  test("banding threshold quantifies the recall guarantee of the shipped 4x8 banding") {
    // the curve is the MMDS S-curve: steep between the verify
    // threshold and 1.0
    assert(DedupOps.bandingRecall(1.0, 4, 8) === 1.0)
    assert(DedupOps.bandingRecall(0.95, 4, 8) > 0.98)
    assert(DedupOps.bandingRecall(0.5, 4, 8) < 0.02) // far pairs stay apart
    // the guaranteed-99%-expected-recall similarity for 4 bands × 8 rows
    val t99 = DedupOps.bandingThreshold(4, 8, target = 0.99)
    assert(t99 > 0.94 && t99 < 0.97, s"t99=$t99")
    // recall is monotone in the threshold: anything above t99 recalls ≥99%
    assert(DedupOps.bandingRecall(t99 + 0.01, 4, 8) >= 0.99)
    // and the planted-perturbation corpus above sits ABOVE the 90%
    // threshold, which is why the 0.9 recall assertion is sound
    val t90 = DedupOps.bandingThreshold(4, 8, target = 0.90)
    assert(t90 < 0.92, s"t90=$t90")
  }
}
