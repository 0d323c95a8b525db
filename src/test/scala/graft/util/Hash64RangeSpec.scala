package graft.util

import org.scalatest.funsuite.AnyFunSuite

/** string64Range must be VALUE-identical to string64(substring) — the
  * n-gram kernels' hash space is shared with every previously written
  * artifact and cross-checked oracle count, so the allocation-free
  * range form may not change a single bit.
  */
class Hash64RangeSpec extends AnyFunSuite {

  test("string64Range == string64(substring) on random windows") {
    val r = new scala.util.Random(7)
    val alpha = "abcdefghijklmnopqrstuvwxyz0123456789 "
    for (_ <- 1 to 200) {
      val len = 1 + r.nextInt(120)
      val s = Array.fill(len)(alpha(r.nextInt(alpha.length))).mkString
      val n = 1 + r.nextInt(math.min(25, len))
      var i = 0
      while (i + n <= len) {
        assert(Hashing.string64Range(s, i, n) ===
          Hashing.string64(s.substring(i, i + n)),
          s"window [$i, ${i + n}) of '$s'")
        i += 1
      }
    }
  }

  test("string64Range handles unicode chars identically") {
    val s = "añb✓cdé f1ç" * 3
    for (n <- Seq(1, 2, 3, 5); i <- 0 to s.length - n) {
      assert(Hashing.string64Range(s, i, n) ===
        Hashing.string64(s.substring(i, i + n)))
    }
  }

  test("winnowDoc ASCII fast path matches the generic path") {
    // craft texts that exercise ties and window edges; the generic
    // path is forced by appending a non-ASCII char and adjusting —
    // instead compare against an explicit hex-based re-derivation
    val r = new scala.util.Random(11)
    val alpha = "ab " // tiny alphabet → many hash ties
    for (seed <- 1 to 30) {
      val len = 30 + r.nextInt(90)
      val t = Array.fill(len)(alpha(r.nextInt(alpha.length))).mkString
      val k = 5; val w = 4
      val (npos, sel, hashes) = graft.text.TextOps.winnowDoc(t, k, w)
      // reference selection on hex strings (the pre-r17 rule)
      val ref = (0 until npos).map(i =>
        Hashing.md5Hex(t.substring(i, i + k)))
      val refSel = scala.collection.mutable.LinkedHashSet[Int]()
      for (j <- 0 to npos - w) {
        var best = j
        for (x <- j + 1 until j + w)
          if (ref(x).compareTo(ref(best)) < 0) best = x
        refSel += best
      }
      assert(sel.toSeq === refSel.toSeq, s"seed=$seed text='$t'")
      sel.foreach(p => assert(hashes(p) === ref(p)))
    }
  }
}
