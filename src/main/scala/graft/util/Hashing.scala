package graft.util

import scala.util.hashing.MurmurHash3

/** Deterministic 64-bit hashing for signature computation (MinHash /
  * SimHash / LSH planes). JVM-side on purpose: signature loops are
  * per-row tight loops over hundreds of tokens × dozens of
  * permutations — as interpreted Catalyst higher-order functions they
  * run ~1000× slower than this (nested lambdas are not codegen'd and
  * projection-collapse re-evaluates the token hash per permutation).
  * The surrounding plan (bucket joins, verification) stays
  * declarative.
  */
object Hashing {

  /** 64-bit string hash from two 32-bit murmur3 runs. */
  def string64(s: String): Long =
    (MurmurHash3.stringHash(s, 0x9747b28c).toLong << 32) |
      (MurmurHash3.stringHash(s, 0x85ebca6b).toLong & 0xffffffffL)

  /** MurmurHash3.stringHash over a char RANGE — value-identical to
    * stringHash(s.substring(from, from + len), seed) without the
    * substring allocation (the same pairwise-char loop the Scala
    * implementation runs; Hash64RangeSpec pins the parity).
    */
  private def rangeStringHash(s: String, from: Int, len: Int, seed: Int): Int = {
    var h = seed
    var i = 0
    while (i + 1 < len) {
      val data = (s.charAt(from + i) << 16) + s.charAt(from + i + 1)
      h = MurmurHash3.mix(h, data)
      i += 2
    }
    if (i < len) h = MurmurHash3.mixLast(h, s.charAt(from + i).toInt)
    MurmurHash3.finalizeHash(h, len)
  }

  /** string64 of a char window — identical value to
    * string64(s.substring(from, from + len)), zero allocation. The
    * per-position n-gram kernels (gramHashes and friends) call this
    * npos times per document; the substring form allocated a String
    * per position.
    */
  def string64Range(s: String, from: Int, len: Int): Long =
    (rangeStringHash(s, from, len, 0x9747b28c).toLong << 32) |
      (rangeStringHash(s, from, len, 0x85ebca6b).toLong & 0xffffffffL)

  /** Lower-case hex of a 16-byte digest buffer (md5Hex's tail, split
    * out for callers that hash into a reused buffer).
    */
  def hex16(d: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < 16) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  // one digest per executor thread, reset per call — getInstance in a
  // per-character hot loop (CDC boundary scan) is avoidable allocation
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Raw md5 of a byte window into a caller-owned 16-byte buffer —
    * the allocation-free form for per-position hot loops (CDC
    * boundary scan) where only a digest nibble is inspected and the
    * 32-char hex string would dominate the cost.
    */
  def md5DigestInto(bytes: Array[Byte], off: Int, len: Int, out: Array[Byte]): Unit = {
    val md = md5Local.get()
    md.reset()
    md.update(bytes, off, len)
    md.digest(out, 0, 16)
    ()
  }

  /** Lower-case hex md5 of the UTF-8 bytes — byte-identical to SQL
    * `md5(...)` in Spark and DuckDB, for JVM-side fingerprinting in
    * the same tight loops.
    */
  def md5Hex(s: String): String = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  /** splitmix64 finalizer — full avalanche of a 64-bit value. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Permutation k of a base hash (universal rehash). */
  def rehash(h: Long, k: Int): Long = mix64(h ^ (k.toLong * 0xc2b2ae3d27d4eb4fL))

  /** distinct char n-gram shingles. */
  def charShingles(s: String, n: Int): Array[String] = {
    if (s == null) return Array.empty // null text normalizes to null: no shingles
    if (s.length < n) return if (s.isEmpty) Array.empty else Array(s)
    val out = new scala.collection.mutable.LinkedHashSet[String]
    var i = 0
    while (i + n <= s.length) { out += s.substring(i, i + n); i += 1 }
    out.toArray
  }

  /** MinHash signature: one string hash per shingle, cheap integer
    * rehash per permutation.
    */
  def minhashSig(shingles: Array[String], nPerm: Int): Array[Long] = {
    val sig = Array.fill(nPerm)(Long.MaxValue)
    var i = 0
    while (i < shingles.length) {
      val h = string64(shingles(i))
      var k = 0
      while (k < nPerm) {
        val hk = rehash(h, k)
        if (hk < sig(k)) sig(k) = hk
        k += 1
      }
      i += 1
    }
    sig
  }

  /** Sorted distinct 64-bit hashes of the char n-gram shingle set of
    * `s`, allocation-free for n ≤ 4: each n-gram's 16-bit chars pack
    * injectively into one long, finalized by mix64 (a bijection) — so
    * DISTINCT n-grams are guaranteed distinct hashes, which string
    * hashing cannot promise — and dedup is sort+compact on a primitive
    * array instead of a per-substring LinkedHashSet. Strings shorter
    * than n hash whole (string64), matching charShingles' whole-string
    * fallback; null/empty → no shingles.
    */
  def charShingleHashes(s: String, n: Int): Array[Long] = {
    require(n <= 4, s"charShingleHashes packs ${n}x16-bit chars into 64 bits; n must be <= 4")
    if (s == null || s.isEmpty) return Array.emptyLongArray
    if (s.length < n) return Array(string64(s))
    val m = s.length - n + 1
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      var acc = 0L
      var j = 0
      while (j < n) { acc = (acc << 16) | s.charAt(i + j).toLong; j += 1 }
      hs(i) = mix64(acc)
      i += 1
    }
    java.util.Arrays.sort(hs)
    var w = 0
    i = 0
    while (i < m) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    if (w == m) hs else java.util.Arrays.copyOf(hs, w)
  }

  /** MinHash signature over pre-hashed shingles (the
    * charShingleHashes fast path): cheap integer rehash per
    * permutation, no string hashing in the loop.
    */
  def minhashSigL(shingleHashes: Array[Long], nPerm: Int): Array[Long] = {
    val sig = Array.fill(nPerm)(Long.MaxValue)
    var i = 0
    while (i < shingleHashes.length) {
      val h = shingleHashes(i)
      var k = 0
      while (k < nPerm) {
        val hk = rehash(h, k)
        if (hk < sig(k)) sig(k) = hk
        k += 1
      }
      i += 1
    }
    sig
  }

  /** 128-bit set fingerprint of a SORTED distinct hash array as two
    * independent 64-bit folds — equal sets ⇔ equal fingerprints up to
    * ~2^-128 collision odds (the compact equality token the J=1.0
    * verify joins on, instead of shipping the whole hash array).
    */
  def setFingerprint(sortedHashes: Array[Long]): (Long, Long) = {
    var f1 = 0xcbf29ce484222325L
    var f2 = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < sortedHashes.length) {
      f1 = mix64(f1 ^ sortedHashes(i))
      f2 = mix64(f2 ^ rehash(sortedHashes(i), 77))
      i += 1
    }
    (f1, f2)
  }

  /** LSH band values over a minhash signature (rowsPerBand each). */
  def bands(sig: Array[Long], rowsPerBand: Int): Array[Long] = {
    val n = sig.length / rowsPerBand
    val out = new Array[Long](n)
    var j = 0
    while (j < n) {
      var acc = 0xcbf29ce484222325L
      var r = 0
      while (r < rowsPerBand) {
        acc = mix64(acc ^ sig(j * rowsPerBand + r))
        r += 1
      }
      out(j) = acc
      j += 1
    }
    out
  }

  /** 64-bit SimHash over a token set; also returns the four 16-bit
    * band values used for LSH bucketing.
    */
  def simhash64(tokens: Array[String]): Long = {
    val counts = new Array[Int](64)
    var i = 0
    while (i < tokens.length) {
      val h = string64(tokens(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var r = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) r |= 1L << b; b += 1 }
    r
  }

  def simhashBands(h: Long): Array[Long] =
    Array(h & 0xffffL, (h >>> 16) & 0xffffL, (h >>> 32) & 0xffffL, (h >>> 48) & 0xffffL)

  /** Deterministic random-hyperplane coefficient for (plane, dim) in
    * [-1, 1) — identical on every executor, no broadcast state.
    */
  def planeCoef(plane: Int, dim: Int): Double =
    (mix64(plane.toLong * 1315423911L + dim) % 100000L) / 100000.0

  /** Hyperplane-sign bucket of `v` in hash table `table` — each table
    * draws its planes from a disjoint index range, so the L tables are
    * independent (the standard multi-table LSH recall amplifier:
    * a near neighbor is found if it shares a bucket in ANY table).
    * `table = 0` reproduces the original single-table bucketing.
    */
  def lshBucket(v: Array[Double], nPlanes: Int, table: Int = 0): Int = {
    var bucket = 0
    var p = 0
    while (p < nPlanes) {
      var dot = 0.0
      var i = 0
      while (i < v.length) { dot += planeCoef(table * nPlanes + p, i) * v(i); i += 1 }
      if (dot > 0) bucket |= 1 << p
      p += 1
    }
    bucket
  }

  /** Multi-probe LSH probing sequence (Lv et al., "Multi-Probe LSH",
    * VLDB 2007, the single-bit-flip simplification): the vector's own
    * bucket FIRST, then the buckets reached by flipping the sign bit
    * of the `extra` hyperplanes whose |dot| is smallest — the
    * boundaries the vector sits closest to, i.e. exactly the
    * neighboring buckets a near-duplicate most likely fell into.
    * Probing q extra buckets per table buys the recall that would
    * otherwise cost q whole extra tables of index storage and
    * bucket-join input. Deterministic: ties in |dot| break toward the
    * lower plane index.
    */
  def lshProbeBuckets(v: Array[Double], nPlanes: Int, table: Int, extra: Int): Seq[Int] = {
    val dots = new Array[Double](nPlanes)
    var bucket = 0
    var p = 0
    while (p < nPlanes) {
      var dot = 0.0
      var i = 0
      while (i < v.length) { dot += planeCoef(table * nPlanes + p, i) * v(i); i += 1 }
      dots(p) = dot
      if (dot > 0) bucket |= 1 << p
      p += 1
    }
    val flips = (0 until nPlanes).sortBy(p => (math.abs(dots(p)), p)).take(extra)
    bucket +: flips.map(p => bucket ^ (1 << p))
  }
}
