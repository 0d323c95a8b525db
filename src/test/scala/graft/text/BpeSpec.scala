package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Pins the BPE learner/kernel (C62/C62b) to the classic algorithm
  * (Sennrich et al. 2016 §3.2): greedy most-frequent-pair merging
  * with deterministic tie-break, and single-pass left-to-right merge
  * application where a freshly merged symbol never re-merges within
  * the same pass. A brute-force reference re-derives every property
  * the shipped code relies on, independent of Spark.
  */
class BpeSpec extends AnyFunSuite {

  /** brute-force reference: literal Sennrich pseudo-code (index scan
    * with skip-by-2 after a merge) — a DIFFERENT formulation than the
    * shipped fold, so agreement is evidence, not tautology. */
  private def refMergePass(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  test("merge pass matches the index-scan reference on adversarial chains") {
    val cases = Seq(
      ("lll", "l", "l"), ("llll", "l", "l"), ("ababab", "a", "b"),
      ("aabb", "a", "b"), ("ba", "a", "b"), ("a", "a", "a"),
      ("abab", "ab", "ab"), ("xabay", "a", "b"))
    for ((w, l, r) <- cases) {
      val syms = w.toCharArray.map(_.toString)
      // pre-merge multi-char symbols when the pair is multi-char
      val start =
        if (l.length > 1) TextOps.bpeMergePass(syms, l.substring(0, 1), l.substring(1))
        else syms
      assert(TextOps.bpeMergePass(start, l, r).toVector ===
        refMergePass(start.toVector, l, r), s"case $w ($l,$r)")
    }
  }

  test("learner reproduces the hand-worked Sennrich example") {
    // vocab from the paper's running example (no </w> marker in our
    // variant): low x5, lower x2, newest x6, widest x3
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = TextOps.bpeLearn(vocab, 4)
    // pair counts round 1: (e,s)=9, (s,t)=9, (w,e)=8 ... tie (e,s) vs
    // (s,t) breaks left-asc: (e,s) first, then after es exists,
    // (es,t)=9 wins round 2, then (l,o)=7, (o,w)=7 → (l,o) first.
    assert(merges.map(m => (m._2, m._3)) ===
      Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    assert(merges.head._4 === 9L)
    // ranks are 1..k in order
    assert(merges.map(_._1) === Seq(1, 2, 3, 4))
  }

  test("token count applies merges in rank order") {
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"))
    assert(TextOps.bpeTokenCount("newest", merges) === 4) // n,e,w,est
    assert(TextOps.bpeTokenCount("low", merges) === 1) // low
    assert(TextOps.bpeTokenCount("lowest", merges) === 2) // low,est
    assert(TextOps.bpeTokenCount("z", merges) === 1)
  }

  test("learner is deterministic under vocab reordering") {
    val vocab = Seq(("abc", 3L), ("bca", 3L), ("cab", 3L), ("abcabc", 1L))
    val a = TextOps.bpeLearn(vocab, 5)
    val b = TextOps.bpeLearn(scala.util.Random.shuffle(vocab), 5)
    assert(a === b)
  }
}
