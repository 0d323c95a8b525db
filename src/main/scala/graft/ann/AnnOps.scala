package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.util.Hashing

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2.C6-C7).
  *
  * Shape chosen for 100 TB: the probe set is tiny and the corpus is
  * huge, so probes are COLLECTED + BROADCAST and scored in ONE
  * mapPartitions pass over the corpus — no join, no shuffle of the
  * corpus, primitive double loops (an interpreted zip_with/aggregate
  * expression per pair measured ~10× slower). Only the per-probe
  * top-k ranking shuffles, and that is k·|probes| rows.
  *
  * Scale path (C7): random-hyperplane LSH buckets — a probe scans
  * only its bucket, turning the linear scan into a bucket-local one.
  */
object AnnOps {

  type QFn = (SparkSession, String) => DataFrame

  /** Corpus as (vec_id, double[]) — the float→double cast matches the
    * DuckDB oracle's CAST(... AS DOUBLE) exactly.
    */
  private def corpus(s: SparkSession, d: String) = {
    import s.implicits._
    s.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .as[(Long, Seq[Double])]
  }

  private def l2(v: Array[Double]): Double = {
    var n = 0.0; var i = 0
    while (i < v.length) { n += v(i) * v(i); i += 1 }
    math.sqrt(n)
  }

  private def dotp(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** All (probe, other, cosine) scores in one broadcast-probe pass. */
  private def probeScores(s: SparkSession, d: String, probeMax: Long): DataFrame = {
    import s.implicits._
    val c = corpus(s, d)
    val probes = c.filter(_._1 < probeMax).collect()
      .map { case (id, v) => (id, v.toArray, l2(v.toArray)) }
    val bp = s.sparkContext.broadcast(probes)
    c.mapPartitions { it =>
      val ps = bp.value
      it.flatMap { case (id, vs) =>
        val v = vs.toArray
        val nb = l2(v)
        ps.iterator.filter(_._1 != id).map { case (pid, pv, pn) =>
          (pid, id, dotp(pv, v) / (pn * nb))
        }
      }
    }.toDF("probe", "neighbor", "cos")
  }

  val entries: Seq[(String, QFn, Option[String])] = Seq(

    // C6: brute-force cosine top-10 for a 16-probe set.
    ("ann_bruteforce", (s: SparkSession, d: String) => {
      val rk = Window.partitionBy("probe").orderBy(col("cos").desc, col("neighbor").asc)
      probeScores(s, d, probeMax = 16)
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

    // C5 kernel (used by dedup): pairs above a similarity threshold.
    ("dd_embed_neardup", (s: SparkSession, d: String) => {
      probeScores(s, d, probeMax = 200)
        .filter(col("probe") < col("neighbor") && col("cos") >= 0.28)
        .select(col("probe").as("a"), col("neighbor").as("b"),
          round(col("cos"), 4).as("cos_sim"))
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
      ORDER BY a, b""")),

    // C7: LSH-bucketed top-5 — probes only score their own bucket.
    ("ann_lsh", (s: SparkSession, d: String) => {
      import s.implicits._
      val c = corpus(s, d)
      val probes = c.filter(_._1 < 16).collect().map { case (id, v) =>
        val a = v.toArray
        (id, a, l2(a), Hashing.lshBucket(a, 8))
      }
      val bp = s.sparkContext.broadcast(probes)
      val scored = c.mapPartitions { it =>
        val ps = bp.value
        it.flatMap { case (id, vs) =>
          val v = vs.toArray
          val bucket = Hashing.lshBucket(v, 8)
          val nb = l2(v)
          ps.iterator
            .filter(p => p._4 == bucket && p._1 != id)
            .map { case (pid, pv, pn, _) => (pid, id, dotp(pv, v) / (pn * nb)) }
        }
      }.toDF("probe", "neighbor", "cos")
      val rk = Window.partitionBy("probe").orderBy(col("cos").desc, col("neighbor").asc)
      scored
        .withColumn("rk", row_number().over(rk))
        .filter(col("rk") <= 5)
        .select(col("probe"), col("rk"), col("neighbor"), round(col("cos"), 4).as("cos_sim"))
        .orderBy("probe", "rk")
    }, None)
  )
}
