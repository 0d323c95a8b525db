package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.util.Hashing

/** Winnowing kernel (TextOps.winnowDoc / winnowFingerprints):
  * the SIGMOD'03 guarantees, checked against a brute-force reference.
  */
class WinnowSpec extends AnyFunSuite {

  private val K = 20
  private val W = 8

  /** Brute-force reference: for every full window, linear-scan the
    * minimal (hash, pos) with leftmost tie-break.
    */
  private def reference(nrm: String): Set[Int] = {
    val npos = nrm.length - K + 1
    if (npos < W) return Set.empty
    val hs = (0 until npos).map(i => Hashing.md5Hex(nrm.substring(i, i + K)))
    (0 to npos - W).map { j =>
      (j until j + W).minBy(p => (hs(p), p))
    }.toSet
  }

  private def randText(seed: Int, len: Int): String = {
    val r = new scala.util.Random(seed)
    val words = Array("spark", "join", "filter", "window", "agg", "scan",
      "merge", "sort", "batch", "stream", "key", "row")
    val sb = new StringBuilder
    while (sb.length < len) {
      if (sb.nonEmpty) sb.append(' ')
      sb.append(words(r.nextInt(words.length)))
    }
    sb.toString.take(len).trim
  }

  test("winnowDoc matches the brute-force reference selection") {
    for (seed <- 1 to 20) {
      val t = randText(seed, 40 + seed * 13)
      val (npos, sel, hashes) = TextOps.winnowDoc(t, K, W)
      assert(npos == math.max(t.length - K + 1, 0))
      assert(sel.toSet == reference(t), s"seed=$seed")
      // selected positions are in range and hashes align
      sel.foreach { p =>
        assert(p >= 0 && p < npos)
        assert(hashes(p) == Hashing.md5Hex(t.substring(p, p + K)))
      }
    }
  }

  test("density stays near the theoretical 2/(w+1)") {
    val t = randText(99, 5000)
    val (npos, sel, _) = TextOps.winnowDoc(t, K, W)
    val density = sel.length.toDouble / npos
    // theory: expected density 2/(w+1) ≈ 0.222 for random hashes
    assert(density > 0.12 && density < 0.35, s"density=$density")
  }

  test("short texts (fewer than w full windows) select nothing") {
    val t = "abcdefghijklmnopqrstuvwxyz" // 26 chars < k + w - 1 = 27
    val (npos, sel, _) = TextOps.winnowDoc(t, K, W)
    assert(npos == 7 && sel.isEmpty)
    assert(TextOps.winnowDoc(null, K, W)._2.isEmpty)
    assert(TextOps.winnowDoc("", K, W)._2.isEmpty)
  }

  test("MOSS guarantee: a shared substring of length >= k+w-1 yields a shared fingerprint") {
    val shared = "the quick brown fox jumps over it" // 33 >= 27
    for (seed <- 1 to 10) {
      val a = randText(seed, 300) + " " + shared + " " + randText(seed + 50, 200)
      val b = randText(seed + 100, 250) + " " + shared + " " + randText(seed + 150, 350)
      val (_, selA, hA) = TextOps.winnowDoc(a, K, W)
      val (_, selB, hB) = TextOps.winnowDoc(b, K, W)
      val fpA = selA.map(hA).toSet
      val fpB = selB.map(hB).toSet
      assert(fpA.intersect(fpB).nonEmpty, s"seed=$seed")
    }
  }

  test("winnowFingerprints normalizes like the column pipeline (punct/case/whitespace)") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val raw = "The QUICK,   brown FOX!!  jumps --- over the lazy dog; " +
      "pack my box with FIVE dozen liquor jugs?? and again the quick brown fox."
    val got = TextOps.winnowFingerprints(spark, Seq((1L, raw)).toDF("doc_id", "text"), K, W)
      .collect().map(_._2).toSet
    val (_, sel, hs) = TextOps.winnowDoc(TextOps.normalizeLocal(raw), K, W)
    assert(got == sel.map(hs).toSet && got.nonEmpty)
  }

  test("winnowFingerprints emits distinct (doc, fp) rows matching the kernel") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val texts = (1 to 5).map(i => (i.toLong, randText(i, 400)))
    val df = texts.toDF("doc_id", "text")
    val got = TextOps.winnowFingerprints(spark, df, K, W).collect().toSet
    val want = texts.flatMap { case (id, t) =>
      // winnowFingerprints normalizes first; these texts are already
      // normalized (lowercase single-space word runs)
      val (_, sel, hs) = TextOps.winnowDoc(t, K, W)
      sel.map(hs).distinct.map(fp => (id, fp))
    }.toSet
    assert(got == want)
  }
}
