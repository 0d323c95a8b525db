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

  test("charShingleHashes = sorted distinct injective hashes of the 4-gram set") {
    val rnd = new scala.util.Random(19)
    (0 until 200).foreach { _ =>
      // small alphabet forces repeated 4-grams → exercises the dedup
      val s = (0 until (1 + rnd.nextInt(80))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      val hs = Hashing.charShingleHashes(s, 4)
      val grams = Hashing.charShingles(s, 4)
      // same SET cardinality as the string shingles (packing is
      // injective on 4-grams, so no two distinct grams may collide)
      assert(hs.length === grams.distinct.length, s"s=$s")
      assert(hs.toSeq === hs.sorted.toSeq)
      assert(hs.distinct.length === hs.length)
      // permutation/multiplicity invariance: shuffled double-ups of
      // the same grams give the same set hash array
      val doubled = s + s.takeRight(math.min(s.length, 4))
      if (doubled.length >= 4 && grams.toSet == Hashing.charShingles(doubled, 4).toSet)
        assert(Hashing.charShingleHashes(doubled, 4).toSeq === hs.toSeq)
    }
    assert(Hashing.charShingleHashes(null, 4).isEmpty)
    assert(Hashing.charShingleHashes("", 4).isEmpty)
    assert(Hashing.charShingleHashes("ab", 4).toSeq === Seq(Hashing.string64("ab")))
  }

  test("setFingerprint: equal sets agree, different sets differ") {
    val rnd = new scala.util.Random(23)
    (0 until 100).foreach { _ =>
      val a = Array.fill(5 + rnd.nextInt(50))(rnd.nextLong()).distinct.sorted
      assert(Hashing.setFingerprint(a) === Hashing.setFingerprint(a.clone()))
      val b = a.dropRight(1)
      if (b.nonEmpty) assert(Hashing.setFingerprint(a) !== Hashing.setFingerprint(b))
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
