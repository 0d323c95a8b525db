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
}
