package graft.ann

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.util.Hashing

/** Quality proof for the hyperplane-LSH path: tiny perturbations of a
  * vector must land in the same bucket (so the bucket-local scan finds
  * them), while the bucketing still splits the corpus.
  */
class AnnRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("perturbed clones share the LSH bucket; buckets partition the corpus") {
    import spark.implicits._
    val vecs = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().take(100)

    var sameBucket = 0
    vecs.foreach { case (_, v) =>
      val a = v.map(_.toDouble).toArray
      val clone = a.clone()
      clone(0) += 1e-4 // tiny perturbation
      if (Hashing.lshBucket(a, 8) == Hashing.lshBucket(clone, 8)) sameBucket += 1
    }
    // a 1e-4 nudge flips a hyperplane side only when the dot product is
    // within 1e-4 of zero — rare
    assert(sameBucket >= 95, s"only $sameBucket/100 clones kept their bucket")

    val buckets = vecs.map { case (_, v) => Hashing.lshBucket(v.map(_.toDouble).toArray, 8) }
    assert(buckets.distinct.length >= 16, "bucketing should spread the corpus")
  }

  test("multi-table LSH path: >=90% top-1 recall of planted perturbed clones") {
    import spark.implicits._
    val base = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().take(16)
    // probes 0..15 are perturbed clones; originals shifted to id+100
    val rows = base.zipWithIndex.map { case ((_, v), i) =>
      (i.toLong, v.updated(0, v.head + 1e-3f))
    } ++ base.map { case (id, v) => (id + 100L, v) }
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-lsh").toString
    rows.toSeq.toDF("vec_id", "embedding").write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")

    val top1 = graft.SparkEntry.queries("ann_lsh")(spark, dir)
      .filter("rk = 1").collect()
      .map(r => r.getAs[Long]("probe") -> r.getAs[Long]("neighbor")).toMap
    val hits = base.zipWithIndex.count { case ((id, _), i) =>
      top1.get(i.toLong).contains(id + 100L)
    }
    assert(hits >= 15, s"LSH top-1 recall $hits/16 below 90% for planted clones")
  }

  test("IVF path: >=90% top-1 recall of planted perturbed clones through probed lists") {
    import spark.implicits._
    val base = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().take(16)
    val rows = base.zipWithIndex.map { case ((_, v), i) =>
      (i.toLong, v.updated(0, v.head + 1e-3f))
    } ++ base.map { case (id, v) => (id + 100L, v) }
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-ivf").toString
    rows.toSeq.toDF("vec_id", "embedding").write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")

    val top1 = graft.SparkEntry.queries("ann_ivf")(spark, dir)
      .filter("rk = 1").collect()
      .map(r => r.getAs[Long]("probe") -> r.getAs[Long]("neighbor")).toMap
    val hits = base.zipWithIndex.count { case ((id, _), i) =>
      top1.get(i.toLong).contains(id + 100L)
    }
    assert(hits >= 15, s"IVF top-1 recall $hits/16 below 90% for planted clones")
  }

  test("graph path (two-layer): >=90% top-1 recall of planted perturbed clones") {
    // r14 bar for the C94 hierarchy (r13 verdict item 5): the L1 beam
    // walk + L2 descent must keep planted-clone recall at the LSH/IVF
    // bar even though the rerank now touches only ef2=8 cells of ≤256
    val recall = AnnOps.plantedCloneRecall(spark, TestSpark.sf,
      graft.SparkEntry.queries("ann_graph_search"))
    assert(recall >= 0.9, s"two-layer graph planted-clone recall $recall")
  }

  test("lsh table count follows spark.graft.ann.lsh.tables (L=2 still recalls clones)") {
    try {
      spark.conf.set("spark.graft.ann.lsh.tables", "2")
      val recall = AnnOps.plantedCloneRecall(spark, TestSpark.sf,
        graft.SparkEntry.queries("ann_lsh"))
      // perturbed clones nearly always share the bucket per table, so
      // even L=2 keeps planted-clone recall high; the conf exists for
      // the genuinely-near (not clone) regime where L buys recall
      assert(recall >= 0.9, s"L=2 planted-clone recall $recall")
    } finally spark.conf.unset("spark.graft.ann.lsh.tables")
  }

  test("brute-force top-1 of a planted clone is the original vector") {
    import spark.implicits._
    val base = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().take(8)
    // corpus = originals + clones with ids shifted; probe ids 0..7 are clones
    val clones = base.map { case (id, v) =>
      (id - 1000L, v.updated(0, v.head + 1e-3f))
    }
    // make clones the probes (vec_id < 16 after shifting into range 0..7)
    val rows = clones.zipWithIndex.map { case ((_, v), i) => (i.toLong, v) } ++
      base.map { case (id, v) => (id + 100L, v) }
    val dir = java.nio.file.Files.createTempDirectory("graft-ann").toString
    rows.toSeq.toDF("vec_id", "embedding").write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")

    val top1 = graft.SparkEntry.queries("ann_bruteforce")(spark, dir)
      .filter("rk = 1").collect()
      .map(r => r.getAs[Long]("probe") -> r.getAs[Long]("neighbor")).toMap
    base.zipWithIndex.foreach { case ((id, _), i) =>
      assert(top1(i.toLong) === id + 100L,
        s"probe $i should match its original ${id + 100L}, got ${top1(i.toLong)}")
    }
  }

  test("MMR re-ranking: rank-1 is the top-1 by relevance; diversification departs from plain top-5") {
    val sf = TestSpark.sf
    val mmr = graft.SparkEntry.queries("ann_mmr_rerank")(spark, sf).collect()
      .groupBy(_.getAs[Long]("probe"))
      .view.mapValues(_.sortBy(_.getAs[Int]("mmr_rank")).map(_.getAs[Long]("neighbor")).toSeq)
      .toMap
    val bf = graft.SparkEntry.queries("ann_bruteforce")(spark, sf).collect()
      .filter(_.getAs[Int]("rk") <= 5)
      .groupBy(_.getAs[Long]("probe"))
      .view.mapValues(_.sortBy(_.getAs[Int]("rk")).map(_.getAs[Long]("neighbor")).toSeq)
      .toMap
    assert(mmr.keySet === bf.keySet)
    mmr.foreach { case (p, picks) =>
      assert(picks.size === 5 && picks.distinct.size === 5, s"probe $p picks: $picks")
      // λ·rel with an empty selected set: first pick IS the most relevant
      assert(picks.head === bf(p).head, s"probe $p rank-1 must equal top-1")
    }
    // the diversity term must actually change SOME ranking — otherwise
    // the penalty is dead code
    val departed = mmr.count { case (p, picks) => picks != bf(p) }
    assert(departed > 0, "MMR selected plain top-5 for every probe — no diversification happened")
  }
}
