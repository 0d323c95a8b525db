package graft.util

import org.scalatest.funsuite.AnyFunSuite

/** Property-style invariants for the signature kernels, with a fixed
  * seed so the suite is deterministic.
  */
class HashingPropSpec extends AnyFunSuite {

  private def randomWordSet(rnd: scala.util.Random): Array[String] =
    Array.fill(5 + rnd.nextInt(56))(s"w${rnd.nextInt(500)}").distinct

  test("string64 is deterministic and collision-sparse on small vocab") {
    val hashes = (0 until 10000).map(i => Hashing.string64(s"tok$i"))
    assert(hashes.distinct.size === 10000)
    assert(Hashing.string64("abc") === Hashing.string64("abc"))
  }

  test("minhash signature positions estimate jaccard (100 random set pairs)") {
    val rnd = new scala.util.Random(7)
    var worst = 0.0
    (0 until 100).foreach { _ =>
      val a = randomWordSet(rnd); val b = randomWordSet(rnd)
      val sa = Hashing.minhashSig(a, 64); val sb = Hashing.minhashSig(b, 64)
      val est = sa.zip(sb).count { case (x, y) => x == y } / 64.0
      val jacc = a.toSet.intersect(b.toSet).size.toDouble / (a.toSet ++ b.toSet).size
      worst = math.max(worst, math.abs(est - jacc))
      // 64 perms → stderr ≤ 0.0625; 5 sigma
      assert(math.abs(est - jacc) <= 0.32, s"est=$est jacc=$jacc")
    }
    assert(worst > 0.0) // sanity: estimates aren't trivially exact
  }

  test("identical inputs give identical signatures, bands and simhash") {
    val rnd = new scala.util.Random(11)
    (0 until 50).foreach { _ =>
      val a = randomWordSet(rnd)
      assert(Hashing.minhashSig(a, 32).toSeq === Hashing.minhashSig(a, 32).toSeq)
      assert(Hashing.simhash64(a) === Hashing.simhash64(a))
      val s = Hashing.minhashSig(a, 32)
      assert(Hashing.bands(s, 8).toSeq === Hashing.bands(s, 8).toSeq)
    }
  }

  test("simhash hamming: equal 0, near small, disjoint larger") {
    val rnd = new scala.util.Random(13)
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    (0 until 50).foreach { _ =>
      val a = randomWordSet(rnd).filter(_ => true)
      if (a.length >= 20) {
        assert(ham(Hashing.simhash64(a), Hashing.simhash64(a)) === 0)
        val near = ham(Hashing.simhash64(a), Hashing.simhash64(a.drop(1)))
        val far = ham(Hashing.simhash64(a), Hashing.simhash64(a.map(_ + "_x")))
        assert(near <= 24, s"near=$near")
        assert(near <= far + 8, s"near=$near far=$far")
      }
    }
  }

  test("charShingles covers the string with distinct n-grams") {
    val rnd = new scala.util.Random(17)
    (0 until 100).foreach { _ =>
      val s = (0 until (4 + rnd.nextInt(60))).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      val sh = Hashing.charShingles(s, 4)
      assert(sh.forall(_.length === 4))
      assert(sh.distinct.length === sh.length)
      assert(sh.length <= s.length - 3)
    }
  }

  test("lshBucket is stable and within range") {
    val v = Array.tabulate(64)(i => math.sin(i + 1))
    val b = Hashing.lshBucket(v, 8)
    assert(b === Hashing.lshBucket(v, 8))
    assert(b >= 0 && b < 256)
  }

  test("md5Hex matches the RFC 1321 vectors (= SQL md5 output format)") {
    assert(Hashing.md5Hex("") === "d41d8cd98f00b204e9800998ecf8427e")
    assert(Hashing.md5Hex("abc") === "900150983cd24fb0d6963f7d28e17f72")
    assert(Hashing.md5Hex("message digest") === "f96b697d7cb7938d525a2f31aaf161d0")
  }
}
