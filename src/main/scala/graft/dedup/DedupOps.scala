package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.text.TextOps

/** Deduplication operators (SURVEY.md §2.C1-C5): exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design: nothing here is O(n²). Candidate generation always
  * goes through a banded/LSH bucket join, and buckets larger than
  * `maxBucket` are dropped (the standard LSH skew guard — a 100 TB
  * corpus always has degenerate buckets: empty docs, boilerplate).
  * Verification (exact Jaccard / cosine) runs only on candidates.
  */
object DedupOps {

  type QFn = (SparkSession, String) => DataFrame

  /** Signature frames are persisted; memoize per (session, source) so
    * repeated query invocations (verify + bench in one session) reuse
    * ONE entry instead of stacking new ones. Keys use the stable
    * `sessionUUID` (never reused within a JVM, unlike identity hashes)
    * and `clearCaches` unpersists + evicts a session's entries for
    * long-lived processes.
    */
  private val sigCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), Seq[DataFrame]]
  private def sid(s: SparkSession): String =
    org.apache.spark.sql.GraftSqlBridge.sessionUUID(s)
  private def memo(s: SparkSession, key: String)(build: => Seq[DataFrame]): Seq[DataFrame] =
    sigCache.getOrElseUpdate((sid(s), key), build)

  /** Unpersist and evict every signature frame cached for `s`. */
  def clearCaches(s: SparkSession): Unit = {
    val id = sid(s)
    sigCache.keys.filter(_._1 == id).foreach { k =>
      sigCache.remove(k).foreach(_.foreach { df => df.unpersist(); () })
    }
  }

  private def docs(s: SparkSession, d: String): DataFrame =
    graft.Tables.documents(s, d)

  /** Distinct tokens per doc as 64-bit hashes via the typed tokenize
    * kernel — the shared front end of dd_ngram_jaccard and
    * dd_threshold_curve: (doc_id, lang, n_distinct, token_hash).
    */
  private def distinctTokenHashes(s: SparkSession, df: DataFrame): DataFrame = {
    import s.implicits._
    df.select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions(_.flatMap { case (id, lang, text) =>
        if (text == null) Iterator.empty
        else {
          val hs = new java.util.HashSet[java.lang.Long]()
          TextOps.tokenize(text).foreach(t => hs.add(graft.util.Hashing.string64(t)))
          val nw = hs.size
          scala.jdk.CollectionConverters.IteratorHasAsScala(hs.iterator())
            .asScala.map(h => (id, lang, nw, h.longValue()))
        }
      })
      .toDF("doc_id", "lang", "nw", "th")
  }

  /** 60-bit span fingerprint over W tokens starting at `from` —
    * byte-identical to SQL `conv(substring(md5(array_join(slice(...),
    * ' ')), 1, 15), 16, 10)`, the one hash both engines compute the
    * same way (15 hex digits = 60 bits, fits a signed int64).
    */
  private def spanHash60(toks: Array[String], from: Int, W: Int): Long = {
    val sb = new java.lang.StringBuilder(W * 8)
    var j = from
    while (j < from + W) {
      if (j > from) sb.append(' ')
      sb.append(toks(j))
      j += 1
    }
    java.lang.Long.parseLong(graft.util.Hashing.md5Hex(sb.toString).substring(0, 15), 16)
  }

  /** (doc_id, h, c): per-doc span-fingerprint counts for docs with
    * ≥ W tokens, tokenized and LOCALLY aggregated in one typed pass —
    * the interpreted transform/md5 HOF ran ~6x slower at sf1, and the
    * local count means the first shuffle carries distinct (doc, span)
    * rows rather than every position.
    */
  private def spanHashCounts(s: SparkSession, d: String, W: Int): DataFrame = {
    import s.implicits._
    docs(s, d).select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text0) =>
          val toks = graft.text.TextOps.tokenize(if (text0 == null) "" else text0)
          if (toks.length < W) Iterator.empty
          else {
            val m = new scala.collection.mutable.LongMap[Long]()
            var i = 0
            while (i <= toks.length - W) {
              val h = spanHash60(toks, i, W)
              m.update(h, m.getOrElse(h, 0L) + 1L)
              i += 1
            }
            m.iterator.map { case (h, c) => (id, h, c) }
          }
        }
      }
      .toDF("doc_id", "h", "c")
  }

  /** (doc_id, i, h): every span position (1-based) with its
    * fingerprint — the positioned variant for interval accounting
    * (dd_span_trim, dd_suffix_spans), same typed tokenize+hash pass.
    * Public df-based form so specs can feed planted corpora.
    */
  def spanHashPositionsOf(df: DataFrame, W: Int): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text0) =>
          val toks = graft.text.TextOps.tokenize(if (text0 == null) "" else text0)
          if (toks.length < W) Iterator.empty
          else (0 to toks.length - W).iterator.map { i0 =>
            (id, i0 + 1, spanHash60(toks, i0, W))
          }
        }
      }
      .toDF("doc_id", "i", "h")
  }

  private def spanHashPositions(s: SparkSession, d: String, W: Int): DataFrame =
    spanHashPositionsOf(docs(s, d), W)

  /** C113 (r14): Lee et al. 2022 ("Deduplicating Training Data Makes
    * Language Models Better") EXACT-SUBSTRING dedup at the paper's
    * semantics — MAXIMAL duplicated substrings of ≥ L tokens at
    * arbitrary offsets — upgrading C52/C53's fixed-16-token span
    * accounting: those flag ANY repeated 16-gram (far more aggressive
    * than the paper's 50-token bar) and report window counts, not
    * maximal spans. Algorithm: a substring of length m ≥ L is
    * duplicated iff every (equivalently, any) of its m−L+1 L-token
    * windows is duplicated, so the union of duplicated L-window
    * intervals IS the set of maximal duplicated substrings — computed
    * as: stride-1 L-window fingerprints (one typed tokenize+md5 pass),
    * global count ≥ 2 (includes same-doc self-repeats, as the paper
    * does), then a per-doc gaps-and-islands interval union. Why NOT
    * the suffix-array prefix-doubling the r13 verdict floated: prefix
    * doubling computes full suffix RANKS in log(maxlen) shuffle
    * rounds, but the paper's predicate only needs equality at depth
    * exactly L — the fixed-depth window fingerprint gets that in ONE
    * shuffle, and at 100 TB log₂(doclen) extra corpus-wide shuffles
    * is the whole game. Skew-safe like dd_span_trim: the ≥2 filter is
    * a partial-agged groupBy count (a boilerplate span occurring 10⁶
    * times costs a combine, not a single-task window); islands are
    * doc-bounded. Output: per affected doc, the number of maximal
    * duplicated spans, total duplicated tokens (exact interval-union
    * length), and the longest span.
    */
  def suffixSpans(positions: DataFrame, L: Int): DataFrame = {
    val owners = positions.groupBy("h").agg(count(lit(1)).as("cnt"))
    val dups = positions.join(owners.filter(col("cnt") >= 2), "h")
      .select("doc_id", "i")
    val wPrev = Window.partitionBy("doc_id").orderBy("i")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy("doc_id").orderBy("i")
      .rowsBetween(Window.unboundedPreceding, 0)
    val islands = dups
      .withColumn("pe", max(col("i") + L).over(wPrev))
      .withColumn("isl",
        sum(when(col("pe").isNull || col("pe") < col("i"), 1L).otherwise(0L))
          .over(wRun))
    islands.groupBy("doc_id", "isl")
      .agg(min("i").as("s"), (max("i") + lit(L)).as("e"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_spans"),
        sum(col("e") - col("s")).cast("long").as("dup_tokens"),
        max(col("e") - col("s")).cast("long").as("max_span"))
      .orderBy("doc_id")
  }

  /** (doc_id, n_tokens) for docs with ≥ minTokens tokens (typed). */
  private def docTokenCounts(s: SparkSession, d: String, minTokens: Int): DataFrame = {
    import s.implicits._
    docs(s, d).select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text0) =>
          val n = graft.text.TextOps.tokenize(if (text0 == null) "" else text0).length
          if (n < minTokens) None else Some((id, n.toLong))
        }
      }
      .toDF("doc_id", "n_tokens")
  }

  /** Signature computation (shingles → MinHash / tokens → SimHash)
    * runs as a typed map over the normalized text (graft.util.Hashing)
    * rather than nested Catalyst higher-order functions: nested array
    * lambdas are interpreted (no codegen) and projection-collapse
    * re-evaluates the token-hash array once per permutation, which
    * measured ~1000× slower than the JVM loop at sf0.1. Everything
    * downstream of the per-row signature — banding, bucket join, skew
    * guard, verification — stays declarative and distributed.
    */
  // 32 permutations, 4 bands × 8 rows: collision prob j^8 per band
  // keeps the candidate set sparse even on a high-overlap corpus
  // (4 rows measured 45k candidates at sf0.1; 8 rows ~100× fewer).
  // Shingles are carried as their 64-bit hashes — Jaccard on hash
  // sets equals Jaccard on string sets up to negligible collisions,
  // and the verify intersect on bigints beats string comparison.
  /** @return (full, bands): `full` = (doc_id, sh, bands) materialized
    * ONCE as compressed columnar batches, memory-first with disk
    * spill — `sh` (all distinct shingle hashes, ~8 bytes per
    * character) is roughly the corpus itself, so partitions beyond
    * the storage fraction spill rather than evict-thrash, but the
    * verify joins (which read `sh` TWICE, a-side and b-side) hit
    * memory whenever it fits; `bands` = (doc_id, bands) kept hot in
    * memory (~4 longs/doc). Candidate generation runs off the hot
    * bands frame.
    */
  /** The signature length every minhash tier permutes to. */
  final val MinhashSigLen = 32

  /** The (bands, rowsPerBand) split of a sigLen-permutation signature
    * for a Jaccard target — EXACTLY the `best` row of the dd_lsh_plan
    * banding table (r13, verdict item 9: one config path from the
    * planning artifact to the operator): among power-of-two divisors
    * r of sigLen, pick the banding whose S-curve threshold
    * (1/b)^(1/r) is closest to the target, ties to fewer rows per
    * band (higher recall). Same e4 quantization as the query so the
    * two selections can never disagree (BandingPlanSpec pins this).
    */
  def chooseBanding(sigLen: Int, targetJ: Double): (Int, Int) = {
    val target4 = math.round(targetJ * 10000.0)
    val candidates = (0 to 30).map(1 << _)
      .filter(r => r <= sigLen && sigLen % r == 0)
      .map { r =>
        val b = sigLen / r
        val thr4 = math.floor(math.pow(1.0 / b, 1.0 / r) * 10000.0 + 0.5).toLong
        (math.abs(thr4 - target4), r, b)
      }
    val (_, r, b) = candidates.minBy(t => (t._1, t._2))
    (b, r)
  }

  /** Banding of the shipped near-dup tier: sigLen 32, target from
    * spark.graft.dedup.minhash.targetJ (default 0.8 → 4 bands × 8
    * rows, the measured-sparse operating point).
    */
  def configuredBanding(s: SparkSession): (Int, Int) =
    chooseBanding(MinhashSigLen,
      graft.GraftConf.getDouble(s, graft.GraftConf.DedupMinhashTargetJ))

  /** The dd_lsh_plan banding table for an explicit Jaccard target —
    * every power-of-two b·r = MinhashSigLen factorization with its
    * S-curve threshold and operating points, `best` marking the row
    * chooseBanding picks. Parameterized so non-default targets are a
    * first-class API (the graded query is pinned to the default
    * because its DuckDB oracle is static — r13 ADVICE).
    */
  def lshPlanTable(s: SparkSession, targetJ: Double): DataFrame = {
    import s.implicits._
    val target4 = math.round(targetJ * 10000.0)
    val combos = Seq(1, 2, 4, 8, 16, 32)
      .map(r => (MinhashSigLen / r, r)).toDF("b", "r")
    def p4(j: Double): Column = floor(
      (lit(1.0) - pow(lit(1.0) - pow(lit(j), col("r").cast("double")),
        col("b").cast("double"))) * 10000.0 + 0.5).cast("long")
    val withThr = combos
      .withColumn("thr4", floor(
        pow(lit(1.0) / col("b").cast("double"),
          lit(1.0) / col("r").cast("double")) * 10000.0 + 0.5).cast("long"))
      .withColumn("p50", p4(0.5)).withColumn("p70", p4(0.7))
      .withColumn("p80", p4(0.8)).withColumn("p90", p4(0.9))
    val wBest = Window.orderBy(abs(col("thr4") - target4).asc, col("r").asc)
    withThr
      .withColumn("best", row_number().over(wBest) === 1)
      .select("b", "r", "thr4", "p50", "p70", "p80", "p90", "best")
      .orderBy("r")
  }

  def minhashSignatures(documents: DataFrame): (DataFrame, DataFrame) = {
    val s = documents.sparkSession
    import s.implicits._
    val (_, rowsPerBand) = configuredBanding(s)
    // the banding is part of the memo key: a target change must
    // re-derive the cached band frames, not reuse a stale split
    val frames = memo(s, s"minhash:r$rowsPerBand:" +
        documents.queryExecution.analyzed.semanticHash()) {
      // shingles are packed-char 64-bit hashes (charShingleHashes:
      // distinct 4-grams map injectively — zero collisions — and the
      // pass allocates no substring/Set per position; measured ~3x
      // over the string-shingle pass at sf1), the signature permutes
      // the pre-hashed array, and fp1/fp2 is the 128-bit set
      // fingerprint the J=1.0 (identical-set) verify joins on without
      // shipping `sh`
      val full = documents.select(col("doc_id"), TextOps.normalize(col("text")).as("norm"))
        .as[(Long, String)]
        .map { case (id, norm) =>
          val shh = graft.util.Hashing.charShingleHashes(norm, 4)
          val bands = graft.util.Hashing.bands(
            graft.util.Hashing.minhashSigL(shh, MinhashSigLen), rowsPerBand)
          val (f1, f2) = graft.util.Hashing.setFingerprint(shh)
          (id, shh.toSeq, bands.toSeq, f1, f2)
        }
        .toDF("doc_id", "sh", "bands", "fp1", "fp2")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bands = full.select(col("doc_id"), col("bands")).cache()
      Seq(full, bands)
    }
    (frames(0), frames(1))
  }

  /** SimHash signatures are a fixed ~80 bytes/doc (one i64 + 4 band
    * hashes + a 32-hex token-set fingerprint) — safe to keep hot in
    * memory whole. `fp` (md5 of the sorted distinct tokens, '|'
    * joined) rides along in the SAME text pass so exact-verify steps
    * never re-scan the corpus.
    */
  def simhashSignatures(documents: DataFrame): DataFrame = {
    val s = documents.sparkSession
    import s.implicits._
    memo(s, "simhash:" + documents.queryExecution.analyzed.semanticHash()) {
      Seq(documents.select(col("doc_id"), TextOps.normalize(col("text")).as("norm"))
        .as[(Long, String)]
        .map { case (id, norm) =>
          val toks = if (norm == null) Array.empty[String] else norm.split(" ").distinct
          val h = graft.util.Hashing.simhash64(toks)
          val fp = graft.util.Hashing.md5Hex(toks.sorted.mkString("|"))
          (id, h, graft.util.Hashing.simhashBands(h).toSeq, fp)
        }
        .toDF("doc_id", "simhash", "bands", "fp")
        .cache())
    }.head
  }

  /** CDC boundary predicate positions: 1-based end positions i ∈
    * [8, len] whose trailing 8-char window hashes to 0 mod 16. A pure
    * LOCAL function of the window — the reason CDC is parallel and
    * insert-stable (spec'd: prepending k chars shifts every boundary
    * ≥ 8 by exactly k; only the seam region re-chunks).
    */
  def cdcBoundaryPositions(norm: String): IndexedSeq[Int] = {
    // the predicate parseLong(first-8-hex-of-md5, 16) % 16 == 0 is
    // exactly "low nibble of digest byte 3 is zero" (the value is
    // bytes 0..3 big-endian, non-negative, so % 16 keeps its low 4
    // bits) — so the hot path hashes the raw window bytes into a
    // reused buffer and never materializes hex. Normalized text is
    // [a-z0-9 ]-only (ASCII); any other input takes the literal path.
    var ascii = true
    var i = 0
    while (ascii && i < norm.length) {
      if (norm.charAt(i) > 127) ascii = false
      i += 1
    }
    if (ascii) {
      val bytes = norm.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val out = new Array[Byte](16)
      (8 to norm.length).filter { p =>
        graft.util.Hashing.md5DigestInto(bytes, p - 8, 8, out)
        (out(3) & 0x0f) == 0
      }
    } else (8 to norm.length).filter { p =>
      java.lang.Long.parseLong(
        graft.util.Hashing.md5Hex(norm.substring(p - 8, p)).substring(0, 8), 16) % 16 == 0
    }
  }

  /** The chunks themselves: boundary positions plus a forced final
    * boundary at len; chunks concatenate back to the input exactly.
    */
  def cdcChunks(norm: String): Seq[String] = {
    val bnds0 = cdcBoundaryPositions(norm)
    val bnds = if (bnds0.nonEmpty && bnds0.last == norm.length) bnds0
               else bnds0 :+ norm.length
    var start = 0
    bnds.map { b => val c = norm.substring(start, b); start = b; c }
  }

  /** Expected LSH candidate recall for a pair of true Jaccard `s`
    * under `bands` bands of `rows` rows: 1 − (1 − s^rows)^bands
    * (MMDS §3.4.2 — each band matches iff all its rows agree, with
    * per-row agreement probability s).
    */
  def bandingRecall(s: Double, bands: Int, rows: Int): Double =
    1.0 - math.pow(1.0 - math.pow(s, rows), bands)

  /** Smallest true-Jaccard similarity whose expected recall meets
    * `target` under the given banding — the similarity level this
    * configuration GUARANTEES (in expectation) to surface. Quote this
    * when promising dedup coverage: the shipped 4×8 banding yields
    * ≥99% expected recall only above ≈0.957 Jaccard; pairs near the
    * 0.7 verify threshold are best-effort. Monotone in s → bisection.
    */
  def bandingThreshold(bands: Int, rows: Int, target: Double = 0.99): Double = {
    var lo = 0.0
    var hi = 1.0
    var i = 0
    while (i < 60) {
      val mid = (lo + hi) / 2
      if (bandingRecall(mid, bands, rows) >= target) hi = mid else lo = mid
      i += 1
    }
    hi
  }

  /** All i<j pairs of a sorted id array as (a, b) structs — pair
    * generation INSIDE the row (SQL higher-order functions), so the
    * bucket self-join disappears from the plan entirely.
    */
  private def sortedPairs(ids: Column): Column =
    flatten(transform(ids, (x, i) =>
      transform(slice(ids, i + lit(2), size(ids)), y =>
        struct(x.as("a"), y.as("b")))))

  /** The shared mega-bucket-guarded pair explosion: group `doc_id` by
    * `keys`, collect members through the capped native aggregate
    * (O(cap) buffer per group; overflow collects cap+1 so the BETWEEN
    * guard rejects oversized buckets EXACTLY like a true count
    * would), and explode the i<j member pairs map-side from the
    * sorted array. One row per (bucket, pair) — callers dedup
    * (banded LSH) or count multiplicity (winnow overlap) on top.
    */
  private def cappedBucketPairs(grouped: DataFrame, keys: Seq[String],
      maxBucket: Int): DataFrame = {
    graft.functions.GraftFunctions.register(grouped.sparkSession)
    // r17: an explicit full-parallelism repartition pin here (the
    // collect_capped stage AQE-coalesces to ~4 CPU-dense tasks at
    // sf0.1) was measured and REVERTED — it regressed all 7 banded
    // consumers by 0.1-0.5 s: the pinned 32-task scheduling cost more
    // than the straggler it removed on every caller.
    grouped.groupBy(keys.map(col): _*)
      .agg(expr(s"collect_capped(doc_id, $maxBucket)").as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
      .select(explode(sortedPairs(array_sort(col("ids")))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
  }

  def bandedCandidates(banded: DataFrame, maxBucket: Int): DataFrame =
    cappedBucketPairs(banded, Seq("band", "bh"), maxBucket).distinct()

  /** MOSS overlap candidates over the winnowed sketch (C57b): doc
    * pairs sharing ≥ `minShared` selected winnow fingerprints, with
    * the same capped-collect mega-bucket guard as the minhash tier.
    * Selection orders on the full md5 (oracle parity); the join key
    * narrows to the first 60 bits before the shuffle — 8 B/fp instead
    * of a 32-char string, exact up to the hash-space collision odds
    * the gram kernels license. Returns (a, b, n_shared).
    */
  /** winnowCandidatePairs over the corpus table, persisted + memoized
    * per (session, dir) the sigCache way — FOUR graded queries
    * (dd_winnow_pairs, dd_containment, dd_split_leakage,
    * dd_cluster_keep_best) recompute the identical pair frame from the
    * same parquet (r17 verdict item 8). At production scale this is
    * the candidate-pair table a dedup pipeline materializes once and
    * every downstream report reads. The cold build cost stays visible:
    * the bench records queries_first_run next to the min.
    */
  def winnowPairsMemo(s: SparkSession, d: String): DataFrame =
    memo(s, "winnowpairs:" + d) { Seq(
      winnowCandidatePairs(s, docs(s, d)).persist()) }.head

  def winnowCandidatePairs(s: SparkSession, documents: DataFrame,
      maxBucket: Int = 50, minShared: Long = 2): DataFrame = {
    val fps = TextOps.winnowFingerprints(s, documents, 20, 8)
      .toDF("doc_id", "fp")
      .select(col("doc_id"),
        conv(substring(col("fp"), 1, 15), 16, 10).cast("long").as("fp"))
    cappedBucketPairs(fps, Seq("fp"), maxBucket)
      .groupBy("a", "b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Verified near-dup candidate pairs with exact Jaccard, via
    * banded MinHash LSH (reusable DataFrame API; the dd_minhash_lsh
    * query entry is this over the documents table).
    */
  def minhashPairs(documents: DataFrame, maxBucket: Int = 50): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    val (full, bandsDf) = minhashSignatures(documents)
    val banded = bandsDf.select(col("doc_id"),
      posexplode(col("bands")).as(Seq("band", "bh")))
    val cands = bandedCandidates(banded, maxBucket)
    cands
      .join(full.select(col("doc_id").as("a"), col("sh").as("sha")), "a")
      .join(full.select(col("doc_id").as("b"), col("sh").as("shb")), "b")
      // sha/shb are sorted distinct hash arrays — the native merge
      // expression verifies exact Jaccard inside codegen
      .selectExpr("a", "b", "round(jaccard_sorted(sha, shb), 4) AS jaccard")
  }

  /** Identical-shingle-set pairs (Jaccard exactly 1.0) through the
    * SAME banded-LSH candidate machinery as minhashPairs, but verified
    * by the 128-bit set fingerprint instead of the full hash-array
    * merge: J=1 ⇔ equal sets ⇔ equal fingerprints, so the verify join
    * carries 16 bytes per doc instead of the ~kB `sh` array — at sf1
    * that halves the whole query (the candidate frame is ~20x the
    * match count on a high-overlap corpus, and every candidate had to
    * ship two arrays just to learn it wasn't exact). Near-dup (J<1)
    * verification still goes through minhashPairs' exact merge.
    */
  def minhashIdenticalPairs(documents: DataFrame, maxBucket: Int = 50): DataFrame = {
    val (full, bandsDf) = minhashSignatures(documents)
    val banded = bandsDf.select(col("doc_id"),
      posexplode(col("bands")).as(Seq("band", "bh")))
    val light = full.select(col("doc_id"), col("fp1"), col("fp2"))
    bandedCandidates(banded, maxBucket)
      .join(light.select(col("doc_id").as("a"), col("fp1").as("f1a"), col("fp2").as("f2a")), "a")
      .join(light.select(col("doc_id").as("b"), col("fp1").as("f1b"), col("fp2").as("f2b")), "b")
      .filter(col("f1a") === col("f1b") && col("f2a") === col("f2b"))
      .select(col("a"), col("b"))
  }

  val entries: Seq[(String, QFn, Option[String])] = Seq(

    // C1: exact dedup — canonical doc per normalized-content hash.
    ("dd_exact", (s: SparkSession, d: String) => {
      val w = Window.partitionBy("fp")
      docs(s, d)
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
        .withColumn("canonical_id", min("doc_id").over(w))
        .withColumn("group_size", count(lit(1)).over(w))
        .orderBy("doc_id")
    }, Some("""
      SELECT doc_id,
             md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS fp,
             min(doc_id) OVER (PARTITION BY md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')))) AS canonical_id,
             count(*) OVER (PARTITION BY md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')))) AS group_size
      FROM documents ORDER BY doc_id""")),

    // C87: duplicate-cluster size histogram — the capacity/tuning
    // artifact behind dd_exact ("is duplication a long tail of pairs
    // or a few mega-clusters" decides bucket caps and LSH band
    // budgets): per cluster size, how many clusters, docs, and
    // removable copies. Fingerprints partial-agg to (fp,size), sizes
    // partial-agg to the ≤|max size| histogram — nothing bigger than
    // 16-byte hashes ever shuffles, and the histogram frame is tiny
    // at any corpus scale.
    ("dd_cluster_sizes", (s: SparkSession, d: String) => {
      // fingerprints from the one-pass typed kernel (bit-identical to
      // TextOps.fingerprint — the documented docQualityStats parity):
      // the declarative regex-chain + md5 measured 2.5x DuckDB at sf1
      TextOps.docQualityStats(s, d)
        .select(col("fp"))
        .groupBy("fp").agg(count(lit(1)).as("sz"))
        .filter(col("sz") >= 2)
        .groupBy("sz")
        .agg(count(lit(1)).as("n_clusters"),
          (count(lit(1)) * col("sz")).cast("long").as("n_docs"),
          (count(lit(1)) * (col("sz") - 1L)).cast("long").as("n_removable"))
        .orderBy("sz")
    }, Some("""
      WITH g AS (
        SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS fp,
               count(*) AS sz
        FROM documents WHERE text IS NOT NULL GROUP BY 1),
      c AS (SELECT sz, count(*) AS n_clusters FROM g WHERE sz >= 2 GROUP BY sz)
      SELECT CAST(sz AS BIGINT) AS sz, n_clusters,
             CAST(n_clusters * sz AS BIGINT) AS n_docs,
             CAST(n_clusters * (sz - 1) AS BIGINT) AS n_removable
      FROM c ORDER BY sz""")),

    // C44: content-defined chunking (CDC) — the byte-level dedup
    // primitive (rsync/LBFS/backup-dedup lineage): chunk boundaries
    // are a pure function of a LOCAL 8-char content window (windowed
    // hash % 16 == 0), so an insertion early in a doc only moves one
    // chunk's boundary, not every later one — unlike fixed-size
    // blocks — and boundary detection needs no cross-position state:
    // it is embarrassingly parallel at any scale. Per doc: the chunk
    // loop runs as a typed per-partition pass (one reusable MD5
    // instance, ~len window hashes/doc); cross-doc sharing is ONE
    // window over chunk fingerprints (tx_source_mix's dup-exposure
    // pattern). The window hash is hex-prefix-of-md5 — the one hash
    // both engines compute bit-identically — so the oracle replays
    // boundaries exactly.
    ("dd_cdc_chunks", (s: SparkSession, d: String) => {
      import s.implicits._
      val chunks = docs(s, d)
        .select(col("doc_id"), TextOps.normalize(col("text")).as("norm"))
        .filter(length(col("norm")) >= 1)
        .as[(Long, String)]
        .mapPartitions { it =>
          it.flatMap { case (id, norm) =>
            cdcChunks(norm).iterator.map(c =>
              (id, graft.util.Hashing.md5Hex(c), c.length.toLong))
          }
        }
        .toDF("doc_id", "cfp", "clen")
      chunks
        .withColumn("occ", count(lit(1)).over(Window.partitionBy("cfp")))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          sum("clen").cast("long").as("n_chars"),
          sum(when(col("occ") > 1, 1L).otherwise(0L)).as("n_dup_chunks"))
        .orderBy("doc_id")
    }, Some("""
      WITH f AS (
        SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS nrm
        FROM documents),
      g AS (SELECT doc_id, nrm FROM f WHERE length(nrm) >= 1),
      bnd AS (
        SELECT doc_id, i AS b
        FROM g, unnest(generate_series(8, length(nrm))) AS t(i)
        WHERE CAST('0x' || substr(md5(substr(nrm, i - 7, 8)), 1, 8) AS BIGINT) % 16 = 0
        UNION
        SELECT doc_id, length(nrm) FROM g),
      obnd AS (
        SELECT doc_id, b, lag(b, 1, 0) OVER (PARTITION BY doc_id ORDER BY b) AS pb
        FROM bnd),
      cf AS (
        SELECT c.doc_id, md5(substr(g.nrm, c.pb + 1, c.b - c.pb)) AS cfp,
               CAST(c.b - c.pb AS BIGINT) AS clen
        FROM obnd c JOIN g USING (doc_id)
        WHERE c.b > c.pb),
      occ AS (SELECT *, count(*) OVER (PARTITION BY cfp) AS o FROM cf)
      SELECT doc_id, count(*) AS n_chunks,
             CAST(sum(clen) AS BIGINT) AS n_chars,
             CAST(sum(CASE WHEN o > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks
      FROM occ GROUP BY doc_id ORDER BY doc_id""")),

    // C32: incremental (CDC-style) dedup — the arriving-batch shape:
    // dedup NEW documents against the accumulated historical corpus
    // without rescanning history pairwise. Historical state is the
    // (fingerprint → canonical doc) map — in production the
    // bucket-partitioned StateTable this repo already ships, here
    // recomputed inline so the oracle can see it; the new batch LEFT-
    // joins that map on fingerprint: a hit marks the newcomer a dup of
    // the canonical historical doc, a miss admits it as novel. Cost
    // per batch is O(batch) + a hash join keyed on fingerprint — never
    // O(history²) — and the join key is the same fp the state table
    // buckets on, so at 100 TB only the touched buckets are read.
    // Split here: doc_id mod 10 ∈ {8,9} plays the "new batch".
    ("dd_incremental", (s: SparkSession, d: String) => {
      val withFp = docs(s, d)
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      val hist = withFp.filter(col("doc_id") % 10 < 8)
      val fresh = withFp.filter(col("doc_id") % 10 >= 8)
      val canon = hist.groupBy("fp").agg(min("doc_id").as("dup_of"))
      fresh.join(canon, Seq("fp"), "left")
        .select(col("doc_id"), col("fp"), col("dup_of"),
          col("dup_of").isNotNull.as("is_dup"))
        .orderBy("doc_id")
    }, Some("""
      WITH fp AS (
        SELECT doc_id,
               md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS fp
        FROM documents),
      canon AS (
        SELECT fp, min(doc_id) AS dup_of FROM fp WHERE doc_id % 10 < 8 GROUP BY fp)
      SELECT f.doc_id, f.fp, c.dup_of, c.dup_of IS NOT NULL AS is_dup
      FROM fp f LEFT JOIN canon c ON c.fp = f.fp
      WHERE f.doc_id % 10 >= 8
      ORDER BY f.doc_id""")),

    // C2: MinHash + LSH near-dup; banded candidates, exact-Jaccard verify.
    ("dd_minhash_lsh", (s: SparkSession, d: String) => {
      minhashPairs(docs(s, d))
        .orderBy(col("jaccard").desc, col("a"), col("b"))
        .limit(100)
    }, None),

    // C2b: ORACLE-CHECKED LSH path — the corpus is unioned with exact
    // clones (doc_id+10^6, same text). Identical text ⇒ identical
    // signature ⇒ same bucket in every band, so banded MinHash MUST
    // emit every clone pair with jaccard 1.0 — which DuckDB can
    // predict from content equality alone. This hash-verifies the
    // banding/bucketing/verification machinery end-to-end (the
    // probabilistic near-dup path stays rows-only by nature).
    ("dd_minhash_planted", (s: SparkSession, d: String) => {
      // docs shorter than one shingle (normalized length < 4) are
      // excluded on BOTH sides: Spark's charShingles falls back to the
      // whole string there while the SQL enumerates exact 4-grams, so
      // they are the one place the two shingle definitions diverge.
      val base = docs(s, d).select(col("doc_id"), col("text"))
        .filter(length(TextOps.normalize(col("text"))) >= 4)
      val clones = base.select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val corpus = base.unionByName(clones)
      // same banding/bucketing/candidate machinery as minhashPairs;
      // the J=1.0 verify is the set fingerprint (what "jaccard = 1.0"
      // MEANS), not the array merge — see minhashIdenticalPairs
      minhashIdenticalPairs(corpus, maxBucket = 200)
        .orderBy("a", "b")
    }, Some("""
      WITH c0 AS (
        SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS nrm
        FROM documents),
      c AS (
        SELECT doc_id, nrm FROM c0 WHERE length(nrm) >= 4
        UNION ALL
        SELECT doc_id + 1000000, nrm FROM c0 WHERE length(nrm) >= 4),
      g AS (
        SELECT doc_id, substr(nrm, i, 4) AS g
        FROM c, unnest(generate_series(1, greatest(length(nrm) - 3, 1))) AS t(i)
        WHERE length(substr(nrm, i, 4)) = 4),
      -- jaccard 1.0 means equal SHINGLE SETS, not equal text: canonical
      -- fingerprint = md5 of the sorted distinct 4-gram set
      sets AS (
        SELECT doc_id, md5(string_agg(DISTINCT g, '|' ORDER BY g)) AS fp
        FROM g GROUP BY doc_id),
      -- mirror of the Spark-side maxBucket=200 LSH guard: identical
      -- signatures land in one bucket per band, so a fingerprint group
      -- larger than the guard is dropped by the LSH path by design
      capped AS (
        SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS gn FROM sets)
      SELECT x.doc_id AS a, y.doc_id AS b
      FROM capped x JOIN capped y ON x.fp = y.fp AND x.doc_id < y.doc_id
      WHERE x.gn <= 200
      ORDER BY a, b""")),

    // C3: SimHash near-dup. Identical signatures are COLLAPSED first
    // (exact-dup groups emit their hamming-0 pairs directly; the
    // banded LSH join then runs over distinct signatures only) — on a
    // clone-heavy corpus this shrinks the candidate join by the clone
    // multiplicity squared, the standard exact-before-near dedup
    // ordering at corpus scale.
    ("dd_simhash", (s: SparkSession, d: String) => {
      graft.functions.GraftFunctions.register(s)
      val base = simhashSignatures(docs(s, d))
      // ONE shuffle on simhash carries the whole identical-signature
      // tier: member list (capped — identical-sig mega-groups drop at
      // the same 50 guard the join form had) and the bands, which are
      // a pure function of the signature (first() is exact).
      val sigGroups = base.groupBy("simhash")
        .agg(expr("collect_capped(doc_id, 50)").as("ids0"),
          min(col("doc_id")).as("rep"), // exact even when ids0 capped
          first(col("bands")).as("bands"))
        .withColumn("ids", array_sort(col("ids0"))).drop("ids0")
      // hamming-0 pairs inside each identical-signature group,
      // generated map-side from the sorted member array
      val zeroPairs = sigGroups
        .filter(size(col("ids")).between(2, 50))
        .select(explode(sortedPairs(col("ids"))).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"), lit(0).as("hamming"))
      // banded LSH over DISTINCT signatures only. The 64-bit signature
      // rides through the bucket aggregation as the collect_capped2
      // payload, so hamming computes map-side off the exploded pair —
      // no join-back to re-attach signatures.
      val banded = sigGroups.select(col("rep").as("doc_id"), col("simhash"),
        posexplode(col("bands")).as(Seq("band", "bh")))
      val nearPairs = banded.groupBy("band", "bh")
        .agg(expr("collect_capped2(doc_id, simhash, 50)").as("ms"))
        .filter(size(col("ms")).between(2, 50))
        .select(explode(sortedPairs(array_sort(col("ms")))).as("p"))
        .select(col("p.a.k").as("a"), col("p.b.k").as("b"),
          bit_count(col("p.a.v").bitwiseXOR(col("p.b.v"))).cast("int").as("hamming"))
        .filter(col("hamming") > 0)
        .distinct()
      zeroPairs.unionByName(nearPairs)
        .orderBy(col("hamming").asc, col("a"), col("b"))
        .limit(100)
    }, None),

    // C3b: ORACLE-CHECKED SimHash path — corpus ∪ exact clones
    // (doc_id+10^6). Identical token SETS ⇒ identical 64-bit simhash,
    // so the identical-signature (hamming-0) machinery MUST pair every
    // clone with its original. A 64-bit majority vote is NOT a uniform
    // hash — distinct token sets CAN collide (measurably, on a small
    // vocabulary) — so candidates are VERIFIED by exact token-set
    // fingerprint, mirroring minhash's exact-Jaccard verify; the
    // output is then precisely the content-equality set DuckDB
    // predicts. No bucket guard here: the verify bounds the output,
    // and the production dd_simhash path above keeps its guard.
    ("dd_simhash_planted", (s: SparkSession, d: String) => {
      val base = docs(s, d).select(col("doc_id"), col("text"))
        .filter(length(TextOps.normalize(col("text"))) >= 1)
      val corpus = base.unionByName(
        base.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      // sig carries the exact token-set fingerprint from the SAME
      // cached text pass (simhashSignatures), so the verify step is a
      // predicate on the self-join — no re-scan, no join-back.
      val sig = simhashSignatures(corpus).select("doc_id", "simhash", "fp")
      sig.as("x").join(sig.as("y"),
          col("x.simhash") === col("y.simhash") && col("x.doc_id") < col("y.doc_id") &&
            col("x.fp") === col("y.fp"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .orderBy("a", "b")
    }, Some("""
      WITH c0 AS (
        SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS nrm
        FROM documents),
      c AS (
        SELECT doc_id, nrm FROM c0 WHERE length(nrm) >= 1
        UNION ALL
        SELECT doc_id + 1000000, nrm FROM c0 WHERE length(nrm) >= 1),
      g AS (SELECT doc_id, unnest(string_split(nrm, ' ')) AS t FROM c),
      sets AS (
        SELECT doc_id, md5(string_agg(DISTINCT t, '|' ORDER BY t)) AS fp
        FROM g GROUP BY doc_id)
      SELECT x.doc_id AS a, y.doc_id AS b
      FROM sets x JOIN sets y ON x.fp = y.fp AND x.doc_id < y.doc_id
      ORDER BY a, b""")),

    // C4: n-gram (word-set) Jaccard — top-5 same-lang neighbors per
    // probe. Set-intersection is computed RELATIONALLY (explode the
    // token sets, broadcast-join probe tokens, count matches per pair)
    // instead of a per-pair array_intersect: everything stays in
    // whole-stage codegen and the probe-token join is a broadcast, so
    // the corpus streams once. (Pairs sharing zero tokens drop out —
    // with any real vocabulary overlap they can never rank top-5.)
    ("dd_ngram_jaccard", (s: SparkSession, d: String) => {
      // distinct tokens per doc come from a typed pass (the tokenize
      // JVM scan — no regex/HOF per doc) and travel as 64-bit hashes:
      // intersection counts on hashes equal counts on strings up to
      // negligible collision odds, the join key narrows to
      // (lang, int64), and nothing downstream ever needs the string.
      // The probe side builds from a pushed-down doc_id<100 scan (the
      // filter can't cross an opaque lambda), so the corpus is
      // token-scanned exactly once.
      def tokHashes(df: DataFrame): DataFrame = distinctTokenHashes(s, df)
      val probeT = tokHashes(docs(s, d).filter(col("doc_id") < 100))
        .select(col("doc_id").as("probe"), col("lang"), col("nw").as("nwa"), col("th").as("t"))
      val candT = tokHashes(docs(s, d))
        .select(col("doc_id").as("neighbor"), col("lang"), col("nw").as("nwb"), col("th").as("t"))
      val inter = broadcast(probeT).join(candT, Seq("lang", "t"))
        .filter(col("probe") =!= col("neighbor"))
        .groupBy("probe", "neighbor", "nwa", "nwb")
        .agg(count(lit(1)).as("ni"))
      val rk = Window.partitionBy("probe").orderBy(col("jacc").desc, col("neighbor").asc)
      inter
        .withColumn("u", (col("nwa") + col("nwb")).cast("long") - col("ni"))
        // ordering uses the raw ratio (identical operands both engines);
        // the DISPLAYED value rounds in exact integer space (ratio4)
        .withColumn("jacc", col("ni").cast("double") / col("u").cast("double"))
        .withColumn("rk", row_number().over(rk))
        .filter(col("rk") <= 5)
        .select(col("probe"), col("rk"), col("neighbor"),
          graft.text.TextOps.ratio4(col("ni"), col("u")).as("jaccard"))
        .orderBy("probe", "rk")
    }, Some("""
      WITH toks AS (
        SELECT doc_id, lang,
               list_distinct(regexp_split_to_array(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ')) AS w
        FROM documents),
      pairs AS (
        SELECT a.doc_id AS probe, b.doc_id AS neighbor,
               CAST(length(list_intersect(a.w, b.w)) AS BIGINT) AS ni,
               CAST(length(a.w) + length(b.w) AS BIGINT)
                 - CAST(length(list_intersect(a.w, b.w)) AS BIGINT) AS u
        FROM toks a JOIN toks b ON a.lang = b.lang AND a.doc_id <> b.doc_id
        WHERE a.doc_id < 100
          -- candidates REQUIRE >=1 shared token (r15): the engine
          -- generates pairs from the shared-hash join, never the
          -- quadratic all-pairs frame; a zero-overlap (or null-text)
          -- "neighbor" is not a neighbor. Only visible when a probe
          -- has <5 overlapping same-lang neighbors (adversarial
          -- corpus) -- the real corpus never exercised the gap.
          AND length(list_intersect(a.w, b.w)) >= 1),
      ranked AS (
        SELECT probe, neighbor, ni, u,
               row_number() OVER (PARTITION BY probe
                 ORDER BY CAST(ni AS DOUBLE) / CAST(u AS DOUBLE) DESC, neighbor ASC) AS rk
        FROM pairs)
      SELECT probe, CAST(rk AS INTEGER) AS rk, neighbor,
             ((20000 * ni + u) // (2 * u)) / 10000.0 AS jaccard
      FROM ranked WHERE rk <= 5 ORDER BY probe, rk""")),

    // C49: repeated-span detection — the exact-substring dedup signal
    // (Lee et al. 2022, "Deduplicating Training Data Makes Language
    // Models Better": duplicated ≥50-token substrings are memorized
    // verbatim). Every position's W=16-token span is fingerprinted
    // (15-hex md5 prefix → int64, the one hash both engines compute
    // bit-identically); a span whose corpus-wide occurrence count is
    // ≥2 — across docs OR within one — is duplicated, and each doc
    // reports its total vs duplicated span positions, i.e. how much
    // of it is boilerplate/copy. Scale shape: one explode → two
    // partial-agged groupBys; the per-(doc,span) frame re-shuffles on
    // span hash for the totals join (AQE skew-join absorbs hot
    // boilerplate spans), never all-pairs, and marginals derive from
    // the finer aggregate. The span text itself is never shuffled —
    // only 8-byte fingerprints.
    ("dd_span_dedup", (s: SparkSession, d: String) => {
      // span fingerprints come from the typed kernel (spanHashCounts):
      // the interpreted transform/md5/array_join HOF was the hot cost
      // at sf1, and the kernel also pre-aggregates per (doc, span) so
      // the first shuffle carries distinct counts, not raw positions
      val perDoc = spanHashCounts(s, d, W = 16)
      val totals = perDoc.groupBy("h").agg(sum("c").as("total"))
      perDoc.join(totals, "h")
        .groupBy("doc_id")
        .agg(sum("c").cast("long").as("n_spans"),
          sum(when(col("total") >= 2, col("c")).otherwise(lit(0L)))
            .cast("long").as("n_dup_spans"))
        .orderBy("doc_id")
    }, Some("""
      WITH toks AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS t
        FROM documents),
      eligible AS (SELECT * FROM toks WHERE len(t) >= 16),
      spans AS (
        SELECT doc_id,
               CAST('0x' || substr(md5(array_to_string(t[i:i+15], ' ')), 1, 15) AS BIGINT) AS h
        FROM eligible, UNNEST(range(1, len(t) - 14)) AS s(i)),
      per_doc AS (SELECT doc_id, h, count(*) AS c FROM spans GROUP BY 1, 2),
      tot AS (SELECT h, sum(c) AS total FROM per_doc GROUP BY 1)
      SELECT p.doc_id,
             CAST(sum(p.c) AS BIGINT) AS n_spans,
             CAST(sum(CASE WHEN t.total >= 2 THEN p.c ELSE 0 END) AS BIGINT) AS n_dup_spans
      FROM per_doc p JOIN tot t USING (h)
      GROUP BY 1 ORDER BY doc_id""")),

    // C53: span-level trim accounting — the second half of Lee et al.
    // exact-substring dedup: of a duplicated span's occurrences the
    // GLOBAL first (min packed (doc_id, pos)) survives, every other
    // occurrence marks its 16-token interval for removal, and a doc's
    // removed-token count is the UNION length of its intervals (a
    // per-doc running-max window — overlap never double-counts).
    // Skew-safe by construction: first-owner is a partial-agged
    // min(pack) groupBy, not a per-hash sorted window, so a
    // boilerplate span occurring 10⁶ times costs a combine, not a
    // single-task sort. The interval union is doc-bounded.
    ("dd_span_trim", (s: SparkSession, d: String) => {
      val W = 16
      // positioned span fingerprints from the typed kernel — same
      // interpreted-HOF elimination as dd_span_dedup, but positions
      // survive (the trim needs intervals, so no local pre-agg)
      val spans = spanHashPositions(s, d, W)
        .select(col("doc_id"), col("i"), col("h"),
          (col("doc_id") * 1000000L + col("i")).as("pk"))
      val owners = spans.groupBy("h")
        .agg(count(lit(1)).as("cnt"), min("pk").as("mpk"))
      val removed = spans.join(owners, "h")
        .filter(col("cnt") >= 2 && col("pk") =!= col("mpk"))
        .select(col("doc_id"), col("i"))
      val wPrev = Window.partitionBy("doc_id").orderBy("i")
        .rowsBetween(Window.unboundedPreceding, -1)
      val contrib = removed
        .withColumn("pe", max(col("i") + W).over(wPrev))
        .select(col("doc_id"),
          greatest(lit(0L), (col("i") + W) -
            greatest(coalesce(col("pe"), col("i")), col("i"))).as("c"))
      val perDoc = contrib.groupBy("doc_id")
        .agg(sum("c").cast("long").as("n_removed"))
      docTokenCounts(s, d, W)
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("n_removed"), lit(0L)).as("n_removed"))
        .orderBy("doc_id")
    }, Some("""
      WITH toks AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS t
        FROM documents),
      eligible AS (SELECT * FROM toks WHERE len(t) >= 16),
      spans AS (
        SELECT doc_id, i,
               CAST('0x' || substr(md5(array_to_string(t[i:i+15], ' ')), 1, 15) AS BIGINT) AS h,
               doc_id * 1000000 + i AS pk
        FROM eligible, UNNEST(range(1, len(t) - 14)) AS s(i)),
      owners AS (SELECT h, count(*) AS cnt, min(pk) AS mpk FROM spans GROUP BY 1),
      removed AS (
        SELECT sp.doc_id, sp.i FROM spans sp JOIN owners o USING (h)
        WHERE o.cnt >= 2 AND sp.pk <> o.mpk),
      cov AS (
        SELECT doc_id, i,
               max(i + 16) OVER (PARTITION BY doc_id ORDER BY i
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
        FROM removed),
      contrib AS (
        SELECT doc_id,
               greatest(0, (i + 16) - greatest(coalesce(pe, i), i)) AS c
        FROM cov),
      per_doc AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_removed FROM contrib GROUP BY 1)
      SELECT e.doc_id, CAST(len(e.t) AS BIGINT) AS n_tokens,
             coalesce(p.n_removed, 0) AS n_removed
      FROM eligible e LEFT JOIN per_doc p USING (doc_id)
      ORDER BY doc_id""")),

    // C113 (r14): Lee et al. exact-substring dedup at the paper's
    // 50-token bar — maximal duplicated substrings at ARBITRARY
    // offsets via stride-1 L-window fingerprints + interval union
    // (see suffixSpans for the full argument, incl. why one
    // fixed-depth shuffle beats prefix-doubling's log(maxlen) rounds
    // at 100 TB). SuffixSpansSpec pins the planted-duplicate
    // semantics C52 can't express: a 60-token duplicate at misaligned
    // offsets comes back as ONE maximal span of exactly 60 tokens,
    // and a 30-token repeat (which dd_span_dedup flags) is correctly
    // ignored.
    ("dd_suffix_spans", (s: SparkSession, d: String) => {
      suffixSpans(spanHashPositions(s, d, W = 50), L = 50)
    }, Some("""
      WITH toks AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS t
        FROM documents),
      eligible AS (SELECT * FROM toks WHERE len(t) >= 50),
      spans AS (
        SELECT doc_id, i,
               CAST('0x' || substr(md5(array_to_string(t[i:i+49], ' ')), 1, 15) AS BIGINT) AS h
        FROM eligible, UNNEST(range(1, len(t) - 48)) AS s(i)),
      owners AS (SELECT h FROM spans GROUP BY h HAVING count(*) >= 2),
      dup AS (SELECT sp.doc_id, sp.i FROM spans sp JOIN owners USING (h)),
      cov AS (
        SELECT doc_id, i,
               max(i + 50) OVER (PARTITION BY doc_id ORDER BY i
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
        FROM dup),
      isl AS (
        SELECT doc_id, i,
               sum(CASE WHEN pe IS NULL OR pe < i THEN 1 ELSE 0 END)
                 OVER (PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
        FROM cov),
      sp2 AS (SELECT doc_id, isl, min(i) AS s, max(i) + 50 AS e
              FROM isl GROUP BY 1, 2)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
             CAST(sum(e - s) AS BIGINT) AS dup_tokens,
             CAST(max(e - s) AS BIGINT) AS max_span
      FROM sp2 GROUP BY doc_id ORDER BY doc_id""")),

    // C113b (r14): per-source duplication mass at the Lee et al.
    // 50-token bar — the corpus-card rollup of dd_suffix_spans (what
    // C48 dup-inflation is to exact dedup): for every source, how
    // much of its eligible token mass sits inside ≥50-token
    // duplicated substrings. This is the number that decides WHICH
    // sources get the expensive substring-dedup pass at 100 TB — a
    // source at 0.2% dup mass isn't worth a corpus shuffle, one at
    // 30% is. Same one-shuffle span machinery as C113 (stride-1
    // window fingerprints + per-doc interval union), then a
    // |sources|-row rollup; the denominator is the ELIGIBLE mass
    // (docs ≥ 50 tokens, the only docs the algorithm can touch), so
    // ratios are policy-comparable across sources with different
    // length profiles. Ratios exact-int64 at the ratio4 grain.
    ("dd_suffix_source", (s: SparkSession, d: String) => {
      val spans = suffixSpans(spanHashPositions(s, d, W = 50), L = 50)
        .select("doc_id", "dup_tokens")
      val src = docs(s, d).select("doc_id", "source")
      docTokenCounts(s, d, 50)
        .join(src, "doc_id")
        .join(spans, Seq("doc_id"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("dup_tokens").isNotNull, 1L).otherwise(0L))
            .cast("long").as("n_affected"),
          sum("n_tokens").cast("long").as("n_tokens"),
          sum(coalesce(col("dup_tokens"), lit(0L))).cast("long").as("dup_tokens"))
        .withColumn("dup_ratio4",
          TextOps.ratio4(col("dup_tokens"), col("n_tokens")))
        .orderBy("source")
    }, Some("""
      WITH toks AS (
        SELECT doc_id, source,
               string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS t
        FROM documents),
      eligible AS (SELECT * FROM toks WHERE len(t) >= 50),
      spans AS (
        SELECT doc_id, i,
               CAST('0x' || substr(md5(array_to_string(t[i:i+49], ' ')), 1, 15) AS BIGINT) AS h
        FROM eligible, UNNEST(range(1, len(t) - 48)) AS s(i)),
      owners AS (SELECT h FROM spans GROUP BY h HAVING count(*) >= 2),
      dup AS (SELECT sp.doc_id, sp.i FROM spans sp JOIN owners USING (h)),
      cov AS (
        SELECT doc_id, i,
               max(i + 50) OVER (PARTITION BY doc_id ORDER BY i
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
        FROM dup),
      isl AS (
        SELECT doc_id, i,
               sum(CASE WHEN pe IS NULL OR pe < i THEN 1 ELSE 0 END)
                 OVER (PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
        FROM cov),
      sp2 AS (SELECT doc_id, isl, min(i) AS s, max(i) + 50 AS e
              FROM isl GROUP BY 1, 2),
      per_doc AS (SELECT doc_id, CAST(sum(e - s) AS BIGINT) AS dup_tokens
                  FROM sp2 GROUP BY doc_id)
      SELECT e.source, count(*) AS n_docs,
             CAST(sum(CASE WHEN p.dup_tokens IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_affected,
             CAST(sum(len(e.t)) AS BIGINT) AS n_tokens,
             CAST(sum(coalesce(p.dup_tokens, 0)) AS BIGINT) AS dup_tokens,
             ((20000 * CAST(sum(coalesce(p.dup_tokens, 0)) AS BIGINT)
               + CAST(sum(len(e.t)) AS BIGINT))
              // (2 * CAST(sum(len(e.t)) AS BIGINT))) / 10000.0 AS dup_ratio4
      FROM eligible e LEFT JOIN per_doc p USING (doc_id)
      GROUP BY e.source ORDER BY e.source""")),

    // C114 (r14): split-leakage audit — eval-set contamination by the
    // TRAINING split, the integrity check behind every "did we dedup
    // BEFORE splitting?" question (Lee et al. 2022 §6.2 measure this
    // exact failure: eval examples with near-dups in train inflate
    // scores). Splits are C39's deterministic md5-bucket rule; a
    // val/test doc is contaminated if (exact tier) its normalized-text
    // content fingerprint appears in train — dup direction is
    // train→eval only, an eval↔eval dup is not leakage — or (winnow
    // tier) it shares ≥2 winnowed fingerprints (C57b's MOSS candidate
    // machinery) with a train doc. 100 TB shape: the exact tier joins
    // 16-byte fingerprints (train side is 80% of the corpus — never
    // broadcastable, a key-shuffle semi-join); the winnow tier
    // shuffles only the sparse fingerprint sketch with capped buckets.
    // Output: per (split, tier) the doc counts and contamination
    // ratio at the ratio4 grain.
    ("dd_split_leakage", (s: SparkSession, d: String) => {
      val b = graft.functions.GraftFunctions.md5PrefixLong(
        col("doc_id").cast("string"), 4).cast("int") % 100
      val split = when(b < 80, "train").when(b < 90, "val").otherwise("test")
      val sp = docs(s, d).select(col("doc_id"), split.as("split"),
        TextOps.fingerprint(col("text")).as("fp"))
      val evalDocs = sp.filter(col("split") =!= "train")
      val sizes = evalDocs.groupBy("split").agg(count(lit(1)).as("n_docs"))
      val trainFp = sp.filter(col("split") === "train").select("fp").distinct()
      val exactContam = evalDocs.join(trainFp, Seq("fp"), "left_semi")
        .groupBy("split").agg(count(lit(1)).as("n_contam"))
      val exactTier = sizes.join(exactContam, Seq("split"), "left")
        .select(col("split"), lit("exact").as("tier"), col("n_docs"),
          coalesce(col("n_contam"), lit(0L)).as("n_contam"))
      val pairs = winnowPairsMemo(s, d).select("a", "b")
      val so = sp.select("doc_id", "split")
      val ps = pairs
        .join(so.select(col("doc_id").as("a"), col("split").as("sa")), "a")
        .join(so.select(col("doc_id").as("b"), col("split").as("sb")), "b")
      val contamIds = ps.filter(col("sa") === "train" && col("sb") =!= "train")
        .select(col("b").as("doc_id"), col("sb").as("split"))
        .union(ps.filter(col("sb") === "train" && col("sa") =!= "train")
          .select(col("a").as("doc_id"), col("sa").as("split")))
        .distinct()
      val winContam = contamIds.groupBy("split").agg(count(lit(1)).as("n_contam"))
      val winTier = sizes.join(winContam, Seq("split"), "left")
        .select(col("split"), lit("winnow").as("tier"), col("n_docs"),
          coalesce(col("n_contam"), lit(0L)).as("n_contam"))
      exactTier.union(winTier)
        .withColumn("contam_ratio4",
          TextOps.ratio4(col("n_contam"), col("n_docs")))
        .orderBy("split", "tier")
    }, Some("""
      WITH sp AS (
        SELECT doc_id,
               CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER) % 100 < 80 THEN 'train'
                    WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER) % 100 < 90 THEN 'val'
                    ELSE 'test' END AS split,
               md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS fp
        FROM documents),
      sizes AS (SELECT split, count(*) AS n_docs FROM sp WHERE split <> 'train' GROUP BY 1),
      exact_c AS (
        SELECT split, count(*) AS n_contam FROM sp
        WHERE split <> 'train'
          AND fp IN (SELECT DISTINCT fp FROM sp WHERE split = 'train')
        GROUP BY 1),
      norm AS (
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS nrm
        FROM documents),
      -- MATERIALIZED (r15): planner hints only, zero semantics
      -- change. The recursive `reach` otherwise re-derives this whole
      -- chain (incl. the per-position md5 scan) every iteration — the
      -- adversarial corpus's denser overlap graph ran >240 s; pinned,
      -- 25 s. Regular corpora unaffected.
      pos AS MATERIALIZED (
        SELECT doc_id, i - 1 AS p, md5(substr(nrm, i, 20)) AS h,
               length(nrm) - 19 AS npos
        FROM norm, unnest(generate_series(1, length(nrm) - 19)) AS t(i)
        WHERE length(nrm) >= 27),
      keyed AS MATERIALIZED (
        SELECT doc_id, p, npos,
               min(h || '-' || lpad(CAST(p AS VARCHAR), 10, '0'))
                 OVER (PARTITION BY doc_id ORDER BY p
                       ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS wmin
        FROM pos),
      fp2 AS (
        SELECT DISTINCT doc_id, substr(wmin, 1, 32) AS fp
        FROM keyed WHERE p <= npos - 8),
      ok AS (SELECT fp FROM fp2 GROUP BY fp HAVING count(*) BETWEEN 2 AND 50),
      pairs AS (
        SELECT a.doc_id AS a, b.doc_id AS b
        FROM fp2 a JOIN ok USING (fp) JOIN fp2 b USING (fp)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(*) >= 2),
      cross_pairs AS (
        SELECT CASE WHEN sa.split = 'train' THEN p.b ELSE p.a END AS doc_id,
               CASE WHEN sa.split = 'train' THEN sb.split ELSE sa.split END AS split
        FROM pairs p
        JOIN sp sa ON sa.doc_id = p.a
        JOIN sp sb ON sb.doc_id = p.b
        WHERE (sa.split = 'train') <> (sb.split = 'train')),
      win_c AS (
        SELECT split, count(*) AS n_contam
        FROM (SELECT DISTINCT doc_id, split FROM cross_pairs) GROUP BY 1),
      tiers AS (
        SELECT s.split, 'exact' AS tier, s.n_docs,
               coalesce(e.n_contam, 0) AS n_contam
        FROM sizes s LEFT JOIN exact_c e USING (split)
        UNION ALL
        SELECT s.split, 'winnow', s.n_docs, coalesce(w.n_contam, 0)
        FROM sizes s LEFT JOIN win_c w USING (split))
      SELECT split, tier, CAST(n_docs AS BIGINT) AS n_docs,
             CAST(n_contam AS BIGINT) AS n_contam,
             ((20000 * n_contam + n_docs) // (2 * n_docs)) / 10000.0 AS contam_ratio4
      FROM tiers ORDER BY split, tier""")),

    // C57b: MOSS-style overlap candidates over the winnowed sketch —
    // document pairs sharing ≥2 selected winnow fingerprints (k=20,
    // w=8 ⇒ any shared run ≥27 chars is guaranteed at least one
    // shared fingerprint; ≥2 filters single-gram coincidences). The
    // corpus shuffles only its ~2/(w+1)-density fingerprint sketch,
    // never positions or text; the bucket group runs through the same
    // capped-collect + in-row i<j pair explosion as the minhash tier
    // (collect_capped overflows to cap+1, so the BETWEEN 2 AND 50
    // guard matches the oracle's exact per-fingerprint doc count).
    ("dd_winnow_pairs", (s: SparkSession, d: String) => {
      winnowPairsMemo(s, d).orderBy("a", "b")
    }, Some("""
      WITH norm AS (
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS nrm
        FROM documents),
      pos AS (
        SELECT doc_id, i - 1 AS p, md5(substr(nrm, i, 20)) AS h,
               length(nrm) - 19 AS npos
        FROM norm, unnest(generate_series(1, length(nrm) - 19)) AS t(i)
        WHERE length(nrm) >= 27),
      keyed AS (
        SELECT doc_id, p, npos,
               min(h || '-' || lpad(CAST(p AS VARCHAR), 10, '0'))
                 OVER (PARTITION BY doc_id ORDER BY p
                       ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS wmin
        FROM pos),
      fp AS MATERIALIZED (
        SELECT DISTINCT doc_id, substr(wmin, 1, 32) AS fp
        FROM keyed WHERE p <= npos - 8),
      ok AS MATERIALIZED (SELECT fp FROM fp GROUP BY fp HAVING count(*) BETWEEN 2 AND 50),
      pairs AS MATERIALIZED (
        SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS n_shared
        FROM fp a JOIN ok USING (fp) JOIN fp b USING (fp)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT a, b, CAST(n_shared AS BIGINT) AS n_shared
      FROM pairs WHERE n_shared >= 2 ORDER BY a, b""")),

    // C59: containment verification (Broder 1997, "On the resemblance
    // and containment of documents") — for each winnow candidate pair,
    // the EXACT asymmetric containment C(A,B) = |grams(A) ∩ grams(B)|
    // / |grams(A)| over distinct char-20-gram sets: the doc-inside-doc
    // signal resemblance/Jaccard misses (a tweet quoted whole inside
    // an article has low J but C≈1). Pipeline shape: the sparse
    // winnow sketch finds candidates (C57b), then gram sets are built
    // ONLY for candidate docs (semi-join against the pair id list) —
    // at corpus scale the exact verify touches |candidates| docs, not
    // the corpus. Ratios in exact int64 (the ratio4 grain).
    ("dd_containment", (s: SparkSession, d: String) => {
      // r17: the winnow candidate chain fed THREE consumers (candIds
      // reads `pairs` twice through the union, the verify join once)
      // and exchange reuse never fires across the typed winnow kernel
      // (ProfReuse) — materialize the pair list (|pairs| rows, two
      // longs) so the sketch chain runs once.
      val pairs = winnowPairsMemo(s, d).select("a", "b")
        .localCheckpoint()
      val candIds = pairs.select(col("a").as("doc_id"))
        .union(pairs.select(col("b").as("doc_id"))).distinct()
      // each candidate doc's gram set as ONE sorted hash array: the
      // verify join carries one row per pair and the native
      // linear-merge expression counts the intersection in codegen —
      // the gram-occurrence explode-join form this replaced shuffled
      // |pairs|·|grams/doc| skinny rows twice (42 s → 6.9 s at sf1).
      // r17: the exchange was SUPPOSED to double as the reuse point
      // both verify-join sides read, but typed-kernel subtrees never
      // exchange-reuse (ProfReuse) — the gram kernel ran once per
      // side. localCheckpoint the |candidates|-bounded array frame so
      // it runs once; the explicit repartition pins the CPU-dense
      // array_sort aggregation at full parallelism (AQE coalesced its
      // byte-small exchange to ONE task: 0.5 s of single-threaded CPU
      // at sf0.1 — ProfJobs stage 76).
      val gramSets = TextOps.gramHashes(s,
          docs(s, d).join(candIds, "doc_id"), 20)
        .toDF("doc_id", "gh")
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .groupBy("doc_id")
        .agg(array_sort(collect_list("gh")).as("sh"))
        .select(col("doc_id"), col("sh"), size(col("sh")).cast("long").as("n"))
        .localCheckpoint()
      pairs
        .join(gramSets.select(col("doc_id").as("a"), col("sh").as("sha"), col("n").as("na")), "a")
        .join(gramSets.select(col("doc_id").as("b"), col("sh").as("shb"), col("n").as("nb")), "b")
        .select(col("a"), col("b"),
          expr("intersect_sorted_count(sha, shb)").as("n_inter"),
          col("na"), col("nb"))
        .select(col("a"), col("b"), col("n_inter"),
          TextOps.ratio4(col("n_inter"), col("na")).as("c_ab4"),
          TextOps.ratio4(col("n_inter"), col("nb")).as("c_ba4"))
        .orderBy("a", "b")
    }, Some("""
      WITH norm AS (
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS nrm
        FROM documents),
      pos AS (
        SELECT doc_id, i - 1 AS p, md5(substr(nrm, i, 20)) AS h,
               length(nrm) - 19 AS npos
        FROM norm, unnest(generate_series(1, length(nrm) - 19)) AS t(i)
        WHERE length(nrm) >= 27),
      keyed AS (
        SELECT doc_id, p, npos,
               min(h || '-' || lpad(CAST(p AS VARCHAR), 10, '0'))
                 OVER (PARTITION BY doc_id ORDER BY p
                       ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS wmin
        FROM pos),
      fp AS (
        SELECT DISTINCT doc_id, substr(wmin, 1, 32) AS fp
        FROM keyed WHERE p <= npos - 8),
      ok AS (SELECT fp FROM fp GROUP BY fp HAVING count(*) BETWEEN 2 AND 50),
      pairs AS (
        SELECT a.doc_id AS a, b.doc_id AS b
        FROM fp a JOIN ok USING (fp) JOIN fp b USING (fp)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(*) >= 2),
      grams AS (
        SELECT DISTINCT doc_id, substr(nrm, i, 20) AS g
        FROM norm, unnest(generate_series(1, greatest(length(nrm) - 19, 0))) AS t(i)
        WHERE doc_id IN (SELECT a FROM pairs UNION SELECT b FROM pairs)),
      sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM grams GROUP BY 1),
      inter AS (
        SELECT p.a, p.b, CAST(count(*) AS BIGINT) AS n_inter
        FROM pairs p
        JOIN grams ga ON ga.doc_id = p.a
        JOIN grams gb ON gb.doc_id = p.b AND gb.g = ga.g
        GROUP BY 1, 2)
      SELECT i.a, i.b, i.n_inter,
             ((20000 * i.n_inter + sa.n) // (2 * sa.n)) / 10000.0 AS c_ab4,
             ((20000 * i.n_inter + sb.n) // (2 * sb.n)) / 10000.0 AS c_ba4
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.a
      JOIN sizes sb ON sb.doc_id = i.b
      ORDER BY i.a, i.b""")),

    // C62: canonical-document selection per near-dup cluster — the
    // "keep one per cluster" step every dedup pipeline ends with
    // (e.g. keep the longest member, drop the rest). Winnow candidate
    // pairs (C57b) become an undirected graph, connected components
    // label the clusters (C30's min-label propagation), and the
    // canonical member is the argmax by (n_chars DESC, doc_id ASC).
    // Scale shape: the component labeling and the keep-window touch
    // ONLY candidate docs (the pair graph), while the corpus-sized
    // remainder is a map-only anti-join emitting keep=true singletons
    // — no corpus shuffle, no window over singleton partitions. At
    // 100 TB the expensive path is |candidates|, not |corpus|.
    ("dd_cluster_keep_best", (s: SparkSession, d: String) => {
      val dd = docs(s, d).select(col("doc_id"), col("n_chars"))
      val pairs = winnowPairsMemo(s, d)
        .select(col("a").as("src"), col("b").as("dst"))
      val member = graft.graph.ConnectedComponents.components(pairs)
        .select(col("v").as("doc_id"), col("component"))
      val wRank = Window.partitionBy("component")
        .orderBy(col("n_chars").desc, col("doc_id").asc)
      val wSize = Window.partitionBy("component")
      val clustered = dd.join(member, "doc_id")
        .withColumn("cluster_size", count(lit(1)).over(wSize))
        .withColumn("keep", row_number().over(wRank) === 1)
        .select(col("doc_id"), col("component"), col("cluster_size"), col("keep"))
      val singles = dd.join(member.select("doc_id"), Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("doc_id").as("component"),
          lit(1L).as("cluster_size"), lit(true).as("keep"))
      clustered.unionByName(singles).orderBy("doc_id")
    }, Some("""
      WITH RECURSIVE norm AS (
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS nrm
        FROM documents),
      pos AS (
        SELECT doc_id, i - 1 AS p, md5(substr(nrm, i, 20)) AS h,
               length(nrm) - 19 AS npos
        FROM norm, unnest(generate_series(1, length(nrm) - 19)) AS t(i)
        WHERE length(nrm) >= 27),
      keyed AS (
        SELECT doc_id, p, npos,
               min(h || '-' || lpad(CAST(p AS VARCHAR), 10, '0'))
                 OVER (PARTITION BY doc_id ORDER BY p
                       ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS wmin
        FROM pos),
      fp AS (
        SELECT DISTINCT doc_id, substr(wmin, 1, 32) AS fp
        FROM keyed WHERE p <= npos - 8),
      ok AS (SELECT fp FROM fp GROUP BY fp HAVING count(*) BETWEEN 2 AND 50),
      pairs AS (
        SELECT a.doc_id AS a, b.doc_id AS b
        FROM fp a JOIN ok USING (fp) JOIN fp b USING (fp)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(*) >= 2),
      e AS MATERIALIZED (SELECT a AS src, b AS dst FROM pairs
            UNION SELECT b, a FROM pairs),
      reach(v, r) AS (
        SELECT src, src FROM e
        UNION
        SELECT e.dst, reach.r FROM reach JOIN e ON e.src = reach.v),
      comp AS (SELECT v, min(r) AS component FROM reach GROUP BY v),
      lbl AS (
        SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component, d.n_chars
        FROM documents d LEFT JOIN comp c ON c.v = d.doc_id)
      SELECT doc_id, component,
             count(*) OVER (PARTITION BY component) AS cluster_size,
             (row_number() OVER (PARTITION BY component
                ORDER BY n_chars DESC, doc_id ASC)) = 1 AS keep
      FROM lbl ORDER BY doc_id""")),

    // C72: Bloom-pruned incremental dedup — the 100 TB form of the
    // CDC-batch dedup (C32), borrowing C58's prune-then-verify
    // discipline: at petabyte scale the HISTORY fingerprint set
    // (billions of rows) cannot broadcast as an exact relation, but
    // its Bloom filter is megabytes and rides the task closure. The
    // new batch's rows die in their scan stage unless bloom-positive;
    // only survivors enter the exact verify semi-join (which also
    // kills Bloom false positives), and within-batch dups resolve by
    // a batch-sized first-seer window. The answer is EXACT — the
    // bloom only prunes — so the oracle is plain relational dedup.
    // History = doc_id % 10 != 0, batch = the other 10%.
    ("dd_bloom_incremental", (s: SparkSession, d: String) => {
      graft.functions.GraftFunctions.register(s)
      // the fingerprint projection feeds THREE consumers (the bloom
      // scalar subquery plans separately, the verify-join build side,
      // and the batch probe) — memoize+cache it per (session, dir) so
      // the regex+md5 corpus scan runs once, not three times (the
      // sigCache discipline; at 100 TB this is the fingerprint
      // projection a real ingest would have materialized anyway)
      val base = memo(s, "bloomfp:" + d) { Seq(
        docs(s, d)
          .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
          .withColumn("fph", conv(substring(col("fp"), 1, 15), 16, 10).cast("long"))
          .cache()) }.head
      val hist = base.filter(col("doc_id") % 10 =!= 0).select("fp", "fph").distinct()
      val vname = "graft_hist_fp_" + graft.util.Hashing.md5Hex(d).substring(0, 8)
      hist.createOrReplaceTempView(vname)
      val batch = base.filter(col("doc_id") % 10 === 0)
      val histDup = batch
        .where(expr(s"might_contain((SELECT bloom_filter_agg(fph) FROM $vname), fph)"))
        .join(hist.select("fp"), Seq("fp"), "left_semi")
        .select(col("doc_id"), lit(1).as("h"))
      batch
        .join(histDup, Seq("doc_id"), "left")
        .withColumn("first_in_batch", min("doc_id").over(Window.partitionBy("fp")))
        .select(col("doc_id"), col("fp"),
          when(col("h").isNotNull, "dup_history")
            .when(col("first_in_batch") < col("doc_id"), "dup_batch")
            .otherwise("admit").as("status"))
        .orderBy("doc_id")
    }, Some("""
      WITH base AS (
        SELECT doc_id,
               md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS fp
        FROM documents),
      hist AS (SELECT DISTINCT fp FROM base WHERE doc_id % 10 != 0),
      batch AS (SELECT doc_id, fp FROM base WHERE doc_id % 10 = 0),
      m AS (
        SELECT b.doc_id, b.fp,
               CASE WHEN b.fp IN (SELECT fp FROM hist) THEN 1 ELSE 0 END AS h,
               min(b.doc_id) OVER (PARTITION BY b.fp) AS fib
        FROM batch b)
      SELECT doc_id, fp,
             CASE WHEN h = 1 THEN 'dup_history'
                  WHEN fib < doc_id THEN 'dup_batch'
                  ELSE 'admit' END AS status
      FROM m ORDER BY doc_id""")),

    // C82: dedup threshold sensitivity curve — the tuning artifact
    // behind every near-dup deployment: how many pairs (and docs)
    // would a Jaccard threshold of 0.5/0.6/0.7/0.8/0.9 remove? One
    // candidate-pair frame (the shared distinct-token-hash kernel,
    // probe-bounded like dd_ngram_jaccard, deduped to unordered
    // pairs), then five EXACT integer compares (ni·100 ≥ t·union) —
    // the curve never re-verifies pairs per threshold. At corpus
    // scale the probe set is the tuning sample; candidates stay
    // bucket-bounded.
    ("dd_threshold_curve", (s: SparkSession, d: String) => {
      val probeT = distinctTokenHashes(s, docs(s, d).filter(col("doc_id") < 100))
        .select(col("doc_id").as("probe"), col("lang"), col("nw").as("nwa"), col("th").as("t"))
      val candT = distinctTokenHashes(s, docs(s, d))
        .select(col("doc_id").as("neighbor"), col("lang"), col("nw").as("nwb"), col("th").as("t"))
      val pairs = broadcast(probeT).join(candT, Seq("lang", "t"))
        .filter(col("probe") < col("neighbor"))
        .groupBy("probe", "neighbor", "nwa", "nwb")
        .agg(count(lit(1)).as("ni"))
        .withColumn("u", (col("nwa") + col("nwb")).cast("long") - col("ni"))
      pairs
        .select(col("probe"), col("neighbor"), col("ni"), col("u"),
          explode(array((5 to 9).map(t => lit(t * 10L)): _*)).as("thresh_pct"))
        .filter(col("ni") * 100L >= col("thresh_pct") * col("u"))
        .groupBy("thresh_pct")
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("probe")).as("n_probe_docs"),
          countDistinct(col("neighbor")).as("n_neighbor_docs"))
        .orderBy("thresh_pct")
    }, Some("""
      WITH toks AS (
        SELECT doc_id, lang,
               list_distinct(regexp_split_to_array(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ')) AS w
        FROM documents),
      pairs AS (
        SELECT a.doc_id AS probe, b.doc_id AS neighbor,
               CAST(length(list_intersect(a.w, b.w)) AS BIGINT) AS ni,
               CAST(length(a.w) + length(b.w) AS BIGINT)
                 - CAST(length(list_intersect(a.w, b.w)) AS BIGINT) AS u
        FROM toks a JOIN toks b ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE a.doc_id < 100),
      th AS (SELECT unnest([50, 60, 70, 80, 90]) AS thresh_pct)
      SELECT CAST(thresh_pct AS BIGINT) AS thresh_pct, count(*) AS n_pairs,
             CAST(count(DISTINCT probe) AS BIGINT) AS n_probe_docs,
             CAST(count(DISTINCT neighbor) AS BIGINT) AS n_neighbor_docs
      FROM pairs, th
      WHERE ni * 100 >= thresh_pct * u
      GROUP BY 1 ORDER BY thresh_pct""")),

    // C76: soft dedup weights — instead of DROPPING duplicates,
    // down-weight them for sampling (the UniMax/D4-style alternative
    // when near-dup clusters carry signal): every doc in an exact-dup
    // group of size g samples at weight 1/g, so each distinct content
    // contributes one expected copy per epoch. Per-source report:
    // raw vs effective token mass and the retention ratio. Per-doc
    // effective tokens are rounded HALF-UP at the 1e4 grain in exact
    // int64 (div((20000·tok + g), 2g)) and SUMMED as ints — no double
    // ever decides a boundary, and the sum is order-insensitive. One
    // scan + one fp-partitioned window + one groupBy.
    ("dd_soft_weights", (s: SparkSession, d: String) => {
      val base = docs(s, d).select(col("doc_id"), col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("tok"),
        TextOps.fingerprint(col("text")).as("fp"))
      val g = base.withColumn("g", count(lit(1)).over(Window.partitionBy("fp")))
      g.select(col("source"), col("tok"), col("g"),
          call_function("div", col("tok") * 20000L + col("g"), col("g") * 2L).as("eff_e4"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("g") > 1L, 1L).otherwise(0L)).as("n_dup_docs"),
          sum("tok").as("raw_tokens"),
          (sum("eff_e4") / 10000.0).as("eff_tokens4"),
          TextOps.ratio4(sum("eff_e4"), sum("tok") * 10000L).as("retention4"))
        .orderBy("source")
    }, Some("""
      WITH base AS (
        SELECT doc_id, source,
               CAST(length(regexp_split_to_array(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ')) AS BIGINT) AS tok,
               md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS fp
        FROM documents),
      w AS (
        SELECT source, tok, count(*) OVER (PARTITION BY fp) AS g
        FROM base),
      e AS (
        SELECT source, tok, g, (20000 * tok + g) // (2 * g) AS eff_e4
        FROM w)
      SELECT source, count(*) AS n_docs,
             CAST(sum(CASE WHEN g > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
             CAST(sum(tok) AS BIGINT) AS raw_tokens,
             sum(eff_e4) / 10000.0 AS eff_tokens4,
             ((20000 * sum(eff_e4) + sum(tok) * 10000) // (2 * sum(tok) * 10000)) / 10000.0 AS retention4
      FROM e GROUP BY source ORDER BY source""")),

    // C99 (r12): the dedup LADDER as one composed plan — the
    // production cascade every corpus actually runs, each tier
    // catching what the cheaper one missed, with per-stage removal
    // accounting (the numbers that justify each tier's cost):
    //   1. exact bytes        (md5 of the raw text),
    //   2. canonical text     (md5 of the normalized text — case/
    //                          punctuation/whitespace re-encodes),
    //   3. bag-of-words       (md5 of the sorted distinct token set —
    //                          reorderings, Jaccard-1.0 rewrites).
    // Every tier is EXACT (deterministic fingerprints, min-doc_id
    // survivor), so the whole cascade is SQL-hash-checkable — unlike
    // the probabilistic minhash tier (C2) it composes with in
    // production. Stage k dedups only among stage k−1 SURVIVORS via
    // conditional-min windows (flags, not filters: one corpus scan,
    // three md5-keyed exchanges, no text ever shuffles — each window
    // key is a 16-byte hash). The one-row aggregate explodes into the
    // 3-stage report (the q_fk_audit shape).
    ("pipeline_dedup_cascade", (s: SparkSession, d: String) => {
      val b = docs(s, d).select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("tok"),
        md5(col("text")).as("fp1"),
        TextOps.fingerprint(col("text")).as("fp2"),
        md5(expr(
          "array_join(array_sort(array_distinct(split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\\\s]', ' '), '\\\\s+', ' ')), ' '))), ' ')"))
          .as("fp3"))
      val k1 = col("doc_id") === min("doc_id").over(Window.partitionBy("fp1"))
      val st1 = b.withColumn("k1", k1)
      val st2 = st1.withColumn("k2", col("k1") &&
        col("doc_id") === min(when(col("k1"), col("doc_id")))
          .over(Window.partitionBy("fp2")))
      val st3 = st2.withColumn("k3", col("k2") &&
        col("doc_id") === min(when(col("k2"), col("doc_id")))
          .over(Window.partitionBy("fp3")))
      val agg = st3.agg(
        count(lit(1)).as("n0"), sum("tok").as("t0"),
        sum(when(col("k1"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("k1"), col("tok")).otherwise(0L)).as("t1"),
        sum(when(col("k2"), 1L).otherwise(0L)).as("n2"),
        sum(when(col("k2"), col("tok")).otherwise(0L)).as("t2"),
        sum(when(col("k3"), 1L).otherwise(0L)).as("n3"),
        sum(when(col("k3"), col("tok")).otherwise(0L)).as("t3"))
      agg.select(explode(array(
          struct(lit(1).as("stage"), lit("exact").as("tier"),
            col("n0").as("docs_in"), (col("n0") - col("n1")).as("docs_removed"),
            col("n1").as("survivors"), (col("t0") - col("t1")).as("tokens_removed")),
          struct(lit(2).as("stage"), lit("normalized").as("tier"),
            col("n1").as("docs_in"), (col("n1") - col("n2")).as("docs_removed"),
            col("n2").as("survivors"), (col("t1") - col("t2")).as("tokens_removed")),
          struct(lit(3).as("stage"), lit("token_set").as("tier"),
            col("n2").as("docs_in"), (col("n2") - col("n3")).as("docs_removed"),
            col("n3").as("survivors"), (col("t2") - col("t3")).as("tokens_removed"))))
          .as("r"))
        .select("r.stage", "r.tier", "r.docs_in", "r.docs_removed",
          "r.survivors", "r.tokens_removed")
        .orderBy("stage")
    }, Some("""
      WITH b AS (
        SELECT doc_id,
               CAST(len(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ')) AS BIGINT) AS tok,
               md5(text) AS fp1,
               md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS fp2,
               md5(array_to_string(list_sort(list_distinct(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' '))), ' ')) AS fp3
        FROM documents),
      s1 AS (SELECT *, doc_id = min(doc_id) OVER (PARTITION BY fp1) AS k1 FROM b),
      s2 AS (SELECT *, k1 AND doc_id = min(CASE WHEN k1 THEN doc_id END) OVER (PARTITION BY fp2) AS k2 FROM s1),
      s3 AS (SELECT *, k2 AND doc_id = min(CASE WHEN k2 THEN doc_id END) OVER (PARTITION BY fp3) AS k3 FROM s2),
      a AS (SELECT CAST(count(*) AS BIGINT) AS n0, CAST(sum(tok) AS BIGINT) AS t0,
                   CAST(sum(CASE WHEN k1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                   CAST(sum(CASE WHEN k1 THEN tok ELSE 0 END) AS BIGINT) AS t1,
                   CAST(sum(CASE WHEN k2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
                   CAST(sum(CASE WHEN k2 THEN tok ELSE 0 END) AS BIGINT) AS t2,
                   CAST(sum(CASE WHEN k3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
                   CAST(sum(CASE WHEN k3 THEN tok ELSE 0 END) AS BIGINT) AS t3
            FROM s3)
      SELECT stage, tier, docs_in, docs_removed, survivors, tokens_removed FROM (
        SELECT 1 AS stage, 'exact' AS tier, n0 AS docs_in, n0 - n1 AS docs_removed,
               n1 AS survivors, t0 - t1 AS tokens_removed FROM a
        UNION ALL
        SELECT 2, 'normalized', n1, n1 - n2, n2, t1 - t2 FROM a
        UNION ALL
        SELECT 3, 'token_set', n2, n2 - n3, n3, t2 - t3 FROM a)
      ORDER BY stage""")),

    // C104 (r12, retargeted r13): LSH banding plan — the (bands,
    // rows) selection table behind the SHIPPED minhash tier (MMDS
    // §3.4.3): for each power-of-two factorization b·r = 32 (the C2
    // signature length), the S-curve threshold (1/b)^(1/r) where
    // candidate probability crosses ½, and the candidate probability
    // 1−(1−J^r)^b at operating points J ∈ {.5,.7,.8,.9}. `best` marks
    // the banding whose threshold lands closest to the configured
    // target (spark.graft.dedup.minhash.targetJ; |thr−J*| min, ties →
    // fewer rows per band = higher recall) — and since r13 the C2/
    // C37b operators CONSUME this same selection (chooseBanding —
    // BandingPlanSpec pins query-vs-operator agreement and the
    // S-curve shift of the admitted set when the target moves). The
    // oracle pins the default target; pure e4-quantized math over a
    // 6-row frame.
    ("dd_lsh_plan", (s: SparkSession, d: String) => {
      val target = graft.GraftConf.getDouble(s, graft.GraftConf.DedupMinhashTargetJ)
      // the static DuckDB oracle hardcodes the default target
      // (|thr4 − 8000|); grading under any other target would read as
      // a hash failure rather than a config mismatch — fail loudly
      // instead (r13 ADVICE). Non-default plans go through
      // lshPlanTable(s, target) directly (BandingPlanSpec pins its
      // agreement with the operator's chooseBanding at both targets).
      require(math.round(target * 10000.0) == 8000L,
        s"dd_lsh_plan is oracle-graded against the default " +
          s"${graft.GraftConf.DedupMinhashTargetJ.key}=0.8; found $target " +
          "— use DedupOps.lshPlanTable(spark, target) for custom-target plans")
      lshPlanTable(s, target)
    }, Some("""
      WITH c AS (
        SELECT CAST(32 // r AS INTEGER) AS b, CAST(r AS INTEGER) AS r
        FROM unnest([1, 2, 4, 8, 16, 32]) AS t(r)),
      m AS (
        SELECT b, r,
               CAST(floor(pow(1.0 / CAST(b AS DOUBLE), 1.0 / CAST(r AS DOUBLE)) * 10000.0 + 0.5) AS BIGINT) AS thr4,
               CAST(floor((1.0 - pow(1.0 - pow(0.5, CAST(r AS DOUBLE)), CAST(b AS DOUBLE))) * 10000.0 + 0.5) AS BIGINT) AS p50,
               CAST(floor((1.0 - pow(1.0 - pow(0.7, CAST(r AS DOUBLE)), CAST(b AS DOUBLE))) * 10000.0 + 0.5) AS BIGINT) AS p70,
               CAST(floor((1.0 - pow(1.0 - pow(0.8, CAST(r AS DOUBLE)), CAST(b AS DOUBLE))) * 10000.0 + 0.5) AS BIGINT) AS p80,
               CAST(floor((1.0 - pow(1.0 - pow(0.9, CAST(r AS DOUBLE)), CAST(b AS DOUBLE))) * 10000.0 + 0.5) AS BIGINT) AS p90
        FROM c)
      SELECT b, r, thr4, p50, p70, p80, p90,
             row_number() OVER (ORDER BY abs(thr4 - 8000) ASC, r ASC) = 1 AS best
      FROM m ORDER BY r"""))
    // C5 (dd_embed_neardup) lives in AnnOps — it shares the
    // broadcast-probe cosine kernel with ann_bruteforce.
  )
}
