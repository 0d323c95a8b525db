package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2.C6-C7).
  *
  * Baseline: brute-force cosine top-k — the probe set is broadcast
  * against the corpus, so the scan is a single pass with no shuffle
  * (the right shape at 100 TB: probes are small, corpus is huge).
  * Scale path: random-hyperplane LSH buckets — probe only scans its
  * bucket (plus multiprobe neighbors), turning the linear scan into a
  * bucket-local one.
  *
  * All vector math is `zip_with`/`aggregate` over array<double> —
  * codegen'd Catalyst expressions, no UDFs.
  */
object AnnOps {

  type QFn = (SparkSession, String) => DataFrame

  /** Cast embedding to double and attach its L2 norm. */
  def withNorm(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(expr("aggregate(v, 0D, (acc, x) -> acc + x * x)")))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  /** Deterministic random-hyperplane coefficient for (plane, dim) —
    * hash-derived so it is identical on every executor with no
    * broadcast state (and reproducible across engines).
    */
  val lshBucketExpr: String =
    """aggregate(sequence(0, 7), 0L, (acc, p) ->
         acc + shiftleft(CASE WHEN aggregate(sequence(0, 63), 0D, (s, i) ->
           s + (CAST(xxhash64(concat('plane', p, '_', i)) % 1000 AS DOUBLE) / 1000.0) * v[i])
           > 0D THEN 1L ELSE 0L END, p))"""

  val entries: Seq[(String, QFn, Option[String])] = Seq(

    // C6: brute-force cosine top-10 for a 16-probe set.
    ("ann_bruteforce", (s: SparkSession, d: String) => {
      val e = withNorm(s.read.parquet(s"$d/embeddings.parquet"))
      val probes = broadcast(e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("probe"), col("v").as("va"), col("nrm").as("na")))
      val rk = Window.partitionBy("probe").orderBy(col("cos").desc, col("neighbor").asc)
      probes.join(e.select(col("vec_id").as("neighbor"), col("v").as("vb"), col("nrm").as("nb")),
          col("probe") =!= col("neighbor"))
        .withColumn("cos", cosine(col("va"), col("vb"), col("na"), col("nb")))
        .withColumn("rk", row_number().over(rk))
        .filter(col("rk") <= 10)
        .select(col("probe"), col("rk"), col("neighbor"), round(col("cos"), 4).as("cos_sim"))
        .orderBy("probe", "rk")
    }, Some("""
      WITH f AS (
        SELECT vec_id, generate_subscripts(embedding, 1) AS i,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings),
      n AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM f GROUP BY vec_id),
      dots AS (
        SELECT a.vec_id AS probe, b.vec_id AS neighbor, sum(a.v * b.v) AS dot
        FROM f a JOIN f b ON a.i = b.i AND a.vec_id <> b.vec_id
        WHERE a.vec_id < 16
        GROUP BY a.vec_id, b.vec_id),
      scored AS (
        SELECT probe, neighbor, dot / (na.nrm * nb.nrm) AS cos,
               row_number() OVER (PARTITION BY probe
                 ORDER BY dot / (na.nrm * nb.nrm) DESC, neighbor ASC) AS rk
        FROM dots JOIN n na ON na.vec_id = probe JOIN n nb ON nb.vec_id = neighbor)
      SELECT probe, rk, neighbor, round(cos, 4) AS cos_sim
      FROM scored WHERE rk <= 10 ORDER BY probe, rk""")),

    // C7: LSH-bucketed top-5 — probe scans only its hyperplane bucket.
    ("ann_lsh", (s: SparkSession, d: String) => {
      val e = withNorm(s.read.parquet(s"$d/embeddings.parquet"))
        .withColumn("bucket", expr(lshBucketExpr))
      val probes = broadcast(e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("probe"), col("v").as("va"),
          col("nrm").as("na"), col("bucket")))
      val rk = Window.partitionBy("probe").orderBy(col("cos").desc, col("neighbor").asc)
      probes.join(
          e.select(col("vec_id").as("neighbor"), col("v").as("vb"),
            col("nrm").as("nb"), col("bucket")), Seq("bucket"))
        .filter(col("probe") =!= col("neighbor"))
        .withColumn("cos", cosine(col("va"), col("vb"), col("na"), col("nb")))
        .withColumn("rk", row_number().over(rk))
        .filter(col("rk") <= 5)
        .select(col("probe"), col("rk"), col("neighbor"), round(col("cos"), 4).as("cos_sim"))
        .orderBy("probe", "rk")
    }, None)
  )
}
