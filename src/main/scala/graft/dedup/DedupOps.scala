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

  private def docs(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/documents.parquet")

  /** distinct char-4-gram shingles; expects a `norm` column. */
  val shinglesExpr: String =
    "array_distinct(transform(sequence(0, greatest(length(norm) - 4, 0)), i -> substring(norm, i + 1, 4)))"

  /** 16-permutation MinHash signature of a shingle set. Permutation k
    * is xxhash64(shingle || '|' || k) — codegen'd, no UDF.
    */
  val minhashSigExpr: String =
    "transform(sequence(0, 15), k -> array_min(transform(sh, s -> xxhash64(concat(s, '|', cast(k AS string))))))"

  /** 4 LSH bands of 4 minhash rows each. */
  val bandsExpr: String =
    "transform(sequence(0, 3), j -> xxhash64(concat_ws(',', transform(slice(sig, j * 4 + 1, 4), x -> cast(x AS string)))))"

  /** 64-bit SimHash over the distinct word set, materialized as four
    * 16-bit band values (band k covers bit positions 16k..16k+15).
    */
  val simhashBandsExpr: String =
    """transform(sequence(0, 3), k ->
         aggregate(sequence(0, 15), 0L, (acc, b) ->
           acc + shiftleft(CASE WHEN aggregate(w, 0, (a2, t) ->
             a2 + CASE WHEN (shiftright(xxhash64(t), k * 16 + b) & 1) = 1 THEN 1 ELSE -1 END) > 0
             THEN 1L ELSE 0L END, b)))"""

  /** Candidate pairs via banded bucket join with a mega-bucket guard. */
  private def bandedCandidates(banded: DataFrame, maxBucket: Int): DataFrame = {
    val ok = banded.groupBy("band", "bh").agg(count(lit(1)).as("bn"))
      .filter(col("bn") <= maxBucket).drop("bn")
    val small = banded.join(ok, Seq("band", "bh"))
    small.as("x").join(small.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
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

    // C2: MinHash + LSH near-dup; banded candidates, exact-Jaccard verify.
    ("dd_minhash_lsh", (s: SparkSession, d: String) => {
      val base = docs(s, d)
        .select(col("doc_id"), TextOps.normalize(col("text")).as("norm"))
        .select(col("doc_id"), expr(shinglesExpr).as("sh"))
      val sig = base.withColumn("sig", expr(minhashSigExpr))
      val banded = sig.select(col("doc_id"),
          posexplode(expr(bandsExpr)).as(Seq("band", "bh")))
      val cands = bandedCandidates(banded, maxBucket = 50)
      val withSets = cands
        .join(base.select(col("doc_id").as("a"), col("sh").as("sha")), "a")
        .join(base.select(col("doc_id").as("b"), col("sh").as("shb")), "b")
      val inter = size(array_intersect(col("sha"), col("shb"))).cast("double")
      val uni = (size(col("sha")) + size(col("shb"))).cast("double") - inter
      withSets
        .withColumn("jacc", inter / uni)
        .select(col("a"), col("b"), round(col("jacc"), 4).as("jaccard"))
        .orderBy(col("jaccard").desc, col("a"), col("b"))
        .limit(100)
    }, None),

    // C3: SimHash near-dup; band-collision candidates, hamming verify.
    ("dd_simhash", (s: SparkSession, d: String) => {
      val base = docs(s, d)
        .select(col("doc_id"), array_distinct(TextOps.tokens(col("text"))).as("w"))
        .withColumn("bands", expr(simhashBandsExpr))
        .withColumn("simhash", expr(
          "bands[0] + shiftleft(bands[1], 16) + shiftleft(bands[2], 32) + shiftleft(bands[3], 48)"))
      val banded = base.select(col("doc_id"),
        posexplode(col("bands")).as(Seq("band", "bh")))
      val cands = bandedCandidates(banded, maxBucket = 50)
      cands
        .join(base.select(col("doc_id").as("a"), col("simhash").as("ha")), "a")
        .join(base.select(col("doc_id").as("b"), col("simhash").as("hb")), "b")
        .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
        .select("a", "b", "hamming")
        .orderBy(col("hamming").asc, col("a"), col("b"))
        .limit(100)
    }, None),

    // C4: n-gram (word-set) Jaccard — top-5 same-lang neighbors per probe.
    ("dd_ngram_jaccard", (s: SparkSession, d: String) => {
      val toks = docs(s, d).select(col("doc_id"), col("lang"),
        array_distinct(TextOps.tokens(col("text"))).as("w"))
      val probes = toks.filter(col("doc_id") < 100)
        .select(col("doc_id").as("probe"), col("lang"), col("w").as("wa"))
      val pairs = broadcast(probes).join(
          toks.select(col("doc_id").as("neighbor"), col("lang"), col("w").as("wb")), Seq("lang"))
        .filter(col("probe") =!= col("neighbor"))
      val inter = size(array_intersect(col("wa"), col("wb"))).cast("double")
      val uni = (size(col("wa")) + size(col("wb"))).cast("double") - inter
      val rk = Window.partitionBy("probe").orderBy(col("jacc").desc, col("neighbor").asc)
      pairs.withColumn("jacc", inter / uni)
        .withColumn("rk", row_number().over(rk))
        .filter(col("rk") <= 5)
        .select(col("probe"), col("rk"), col("neighbor"), round(col("jacc"), 4).as("jaccard"))
        .orderBy("probe", "rk")
    }, Some("""
      WITH toks AS (
        SELECT doc_id, lang,
               list_distinct(regexp_split_to_array(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ')) AS w
        FROM documents),
      pairs AS (
        SELECT a.doc_id AS probe, b.doc_id AS neighbor,
               CAST(length(list_intersect(a.w, b.w)) AS DOUBLE)
                 / (CAST(length(a.w) + length(b.w) AS DOUBLE) - CAST(length(list_intersect(a.w, b.w)) AS DOUBLE)) AS jacc
        FROM toks a JOIN toks b ON a.lang = b.lang AND a.doc_id <> b.doc_id
        WHERE a.doc_id < 100),
      ranked AS (
        SELECT probe, neighbor, jacc,
               row_number() OVER (PARTITION BY probe ORDER BY jacc DESC, neighbor ASC) AS rk
        FROM pairs)
      SELECT probe, rk, neighbor, round(jacc, 4) AS jaccard
      FROM ranked WHERE rk <= 5 ORDER BY probe, rk""")),

    // C5: embedding-cosine near-dup over a probe window (double-precision
    // dot on both engines; see AnnOps for the shared kernel).
    ("dd_embed_neardup", (s: SparkSession, d: String) => {
      val e = graft.ann.AnnOps.withNorm(s.read.parquet(s"$d/embeddings.parquet"))
      val probes = broadcast(e.filter(col("vec_id") < 200)
        .select(col("vec_id").as("a"), col("v").as("va"), col("nrm").as("na")))
      val cand = e.select(col("vec_id").as("b"), col("v").as("vb"), col("nrm").as("nb"))
      probes.join(cand, col("a") < col("b"))
        .withColumn("cos", graft.ann.AnnOps.cosine(col("va"), col("vb"), col("na"), col("nb")))
        .filter(col("cos") >= 0.28)
        .select(col("a"), col("b"), round(col("cos"), 4).as("cos_sim"))
        .orderBy("a", "b")
    }, Some("""
      WITH f AS (
        SELECT vec_id, generate_subscripts(embedding, 1) AS i,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings),
      n AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM f GROUP BY vec_id),
      dots AS (
        SELECT a.vec_id AS a, b.vec_id AS b, sum(a.v * b.v) AS dot
        FROM f a JOIN f b ON a.i = b.i AND a.vec_id < b.vec_id
        WHERE a.vec_id < 200
        GROUP BY a.vec_id, b.vec_id)
      SELECT dots.a, dots.b, round(dot / (na.nrm * nb.nrm), 4) AS cos_sim
      FROM dots JOIN n na ON na.vec_id = dots.a JOIN n nb ON nb.vec_id = dots.b
      WHERE dot / (na.nrm * nb.nrm) >= 0.28
      ORDER BY a, b"""))
  )
}
