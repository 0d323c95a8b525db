package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

/** Closes the SURVEY §9 recall item: the banded-LSH promise is
  * quantified by `bandingThreshold` (4×8 banding ⇒ ≥99% expected
  * recall only above J≈0.957) — this spec PLANTS near-dup pairs whose
  * true Jaccard sits above that threshold (single-char perturbations
  * of ~600-char texts: ≤8 of ~600 distinct char-4-shingles change,
  * J ≳ 0.97) and asserts the real query path (minhashPairs: typed
  * signatures → banding → capped bucket join → exact verify) surfaces
  * ≥90% of them with their verified Jaccard.
  */
class MinhashNearDupRecallSpec extends AnyFunSuite {

  test("banded LSH surfaces >=90% of planted near-dups above the banding threshold") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val nPairs = 100
    val docs = (0 until nPairs).flatMap { i =>
      val base = (1 to 600).map { _ =>
        val r = rnd.nextInt(27)
        if (r == 26) ' ' else ('a' + r).toChar
      }.mkString.trim.replaceAll(" +", " ")
      val mid = base.length / 2
      val repl = if (base(mid) == 'q') 'z' else 'q'
      val pert = base.updated(mid, repl)
      Seq((i * 2L, base), (i * 2L + 1, pert))
    }
    val df = docs.toDF("doc_id", "text")

    // sanity: the perturbation keeps true Jaccard above the quoted
    // guaranteed-recall threshold for the shipped 4x8 banding
    val thr = DedupOps.bandingThreshold(4, 8)
    assert(thr < 0.96, s"banding threshold moved: $thr")

    val found = DedupOps.minhashPairs(df)
      .filter("jaccard >= 0.9")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => a / 2 == b / 2 && a != b }
      .toSet
    val recall = found.size.toDouble / nPairs
    assert(recall >= 0.9, s"recall $recall (${found.size}/$nPairs)")
  }
}
