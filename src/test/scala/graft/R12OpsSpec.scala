package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-12 operator tranche: graph-navigation ANN (beam walk over a
  * pivot k-NN graph), perceptual-hash near-dup, split-distribution
  * KL divergence, embedding hygiene audit, UNPIVOT reshape.
  */
class R12OpsSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  test("ann_graph_search: planted-clone recall >= 0.9 and ranked-output invariants") {
    val spark = TestSpark.spark
    val recall = ann.AnnOps.plantedCloneRecall(spark, sf,
      SparkEntry.queries("ann_graph_search"))
    // same bar as the LSH/IVF paths: a tiny perturbation of a corpus
    // vector must find its original through the full beam-walk path
    assert(recall >= 0.9, s"planted-clone recall $recall < 0.9")
    val out = SparkEntry.queries("ann_graph_search")(spark, sf).collect()
    val byProbe = out.groupBy(_.getAs[Long]("probe"))
    assert(byProbe.size == 16)
    byProbe.foreach { case (p, rows) =>
      assert(rows.length == 5, s"probe $p returned ${rows.length} rows")
      val ordered = rows.sortBy(_.getAs[Int]("rk"))
      val cs = ordered.map(_.getAs[Double]("cos4"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b },
        s"probe $p cos4 not non-increasing: ${cs.mkString(",")}")
    }
  }

  test("mm_phash_neardup: every planted one-byte edit pairs with its original at hamming <= 1") {
    val spark = TestSpark.spark
    val expected = Tables.documents(spark, sf)
      .filter(length(col("text")) >= 64 && col("doc_id") % 97 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(expected.nonEmpty, "fixture has no plantable docs")
    val pairs = SparkEntry.queries("mm_phash_neardup")(spark, sf).collect()
    // planted variants live at -doc_id - 1 (collision-free with any
    // positive id space), so a planted pair is exactly a + b == -1
    // with b = the original doc
    val planted = pairs.filter(_.getAs[Boolean]("planted"))
      .map(r => r.getAs[Long]("b") -> r.getAs[Int]("hamming")).toMap
    expected.foreach { id =>
      assert(planted.contains(id), s"planted edit of doc $id not recalled")
      assert(planted(id) <= 1, s"doc $id planted hamming ${planted(id)} > 1")
    }
  }

  test("tx_split_kl: train divergence is exactly 0; a skewed split shows positive KL") {
    val spark = TestSpark.spark
    import spark.implicits._
    val real = SparkEntry.queries("tx_split_kl")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("kl_e4")).toMap
    assert(real("train") == 0L, s"train KL must be 0, got ${real("train")}")
    // skewed fixture: doc_ids are chosen so the val bucket (md5 % 100
    // in [80,90)) carries a DIFFERENT vocabulary than train — KL must
    // see it
    val bucket = (id: Long) => {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      (((h(0) & 0xff) << 8 | (h(1) & 0xff)) % 100)
    }
    val ids = (0L until 4000L)
    val trainIds = ids.filter(bucket(_) < 80).take(60)
    val valIds = ids.filter(i => bucket(i) >= 80 && bucket(i) < 90).take(60)
    assert(trainIds.nonEmpty && valIds.nonEmpty)
    val rows = trainIds.map(i => (i, "alpha beta gamma delta", "en", "s", 20L)) ++
      valIds.map(i => (i, "omega psi chi phi", "en", "s", 16L))
    val dir = java.nio.file.Files.createTempDirectory("graft-skew").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val skewed = SparkEntry.queries("tx_split_kl")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("kl_e4")).toMap
    assert(skewed("train") == 0L)
    assert(skewed("val") > 10000L,
      s"disjoint-vocab val split should diverge hard, got ${skewed("val")}")
  }

  test("ann_vector_audit: planted zero vector and exact duplicate are counted") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-vaudit").toString
    Seq(
      (0L, Array(1.0f, 0.0f), 7),
      (1L, Array(0.0f, 0.0f), 7),   // zero vector
      (2L, Array(0.5f, 0.5f), 7),
      (3L, Array(0.5f, 0.5f), 7),   // exact dup of 2
      (4L, Array(0.0f, 1.0f), 8))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = SparkEntry.queries("ann_vector_audit")(spark, dir)
      .collect().map(r => r.getAs[Int]("label") -> r).toMap
    assert(rows(7).getAs[Long]("n") == 4L)
    assert(rows(7).getAs[Long]("n_zero") == 1L)
    assert(rows(7).getAs[Long]("n_dup") == 1L)
    assert(rows(7).getAs[Long]("min_norm_e4") == 0L)
    assert(rows(8).getAs[Long]("n_zero") == 0L)
    assert(rows(8).getAs[Long]("max_norm_e4") == 10000L)
  }

  test("pipeline_dedup_cascade: each tier catches exactly its class of duplicate") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cascade").toString
    Seq(
      (1L, "alpha beta gamma", "en", "s", 16L),
      (2L, "alpha beta gamma", "en", "s", 16L),      // exact dup → tier 1
      (3L, "Alpha, beta GAMMA!", "en", "s", 18L),    // re-encode → tier 2
      (4L, "gamma beta alpha alpha", "en", "s", 22L), // reorder/bag → tier 3
      (5L, "totally different words here", "en", "s", 28L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("pipeline_dedup_cascade")(spark, dir)
      .collect().map(r => r.getAs[Int]("stage") ->
        (r.getAs[Long]("docs_in"), r.getAs[Long]("docs_removed"), r.getAs[Long]("survivors"))).toMap
    assert(rows(1) == (5L, 1L, 4L), s"exact tier: ${rows(1)}")
    assert(rows(2) == (4L, 1L, 3L), s"normalized tier: ${rows(2)}")
    assert(rows(3) == (3L, 1L, 2L), s"token-set tier: ${rows(3)}")
  }

  test("tx_bm25_search: shared rare terms rank above partial overlap; self and no-overlap excluded") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25").toString
    Seq(
      (1L, "zeta eta theta", "en", "s", 14L),            // the probe
      (10L, "zeta eta theta misc", "en", "s", 19L),      // 3 shared terms
      (11L, "common words only here", "en", "s", 22L),   // no overlap
      (12L, "zeta misc2 misc3 misc4", "en", "s", 22L))   // 1 shared term
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("tx_bm25_search")(spark, dir)
      .filter(col("probe") === 1L).collect()
      .sortBy(_.getAs[Int]("rk")).map(_.getAs[Long]("match_id"))
    assert(out.toSeq == Seq(10L, 12L), s"got ${out.toSeq}")
    // NDCG eval on the same fixture: the system ranking (10 then 12)
    // IS the ideal relevance order (3 shared terms > 1) → NDCG = 1.0
    val ndcg = SparkEntry.queries("tx_ndcg_eval")(spark, dir)
      .filter(col("probe") === 1L).collect()
    assert(ndcg.length == 1 && ndcg(0).getAs[Long]("ndcg_e4") == 10000L,
      s"perfect ranking should score 10000, got ${ndcg.toSeq}")
  }

  test("tx_pmi_collocations: a repeated fixed phrase wins over independent co-occurrence") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pmi").toString
    // "new york" always occurs as the phrase; "the" co-occurs with
    // everything — PMI must rank the phrase first and punish "the"
    val rows = (0L until 20L).map { i =>
      (i, s"the w$i visited new york with the w${i + 100} crowd", "en", "s", 40L)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("tx_pmi_collocations")(spark, dir).collect()
    assert(out.nonEmpty)
    val top = out.head
    assert((top.getString(0), top.getString(1)) == ("new", "york"),
      s"top collocation was (${top.getString(0)}, ${top.getString(1)})")
    // every surviving pair respects the min-count floor
    assert(out.forall(_.getAs[Long]("n_ab") >= 5L))
  }

  test("q_percentile_cont interpolates exactly between bracketing ranks") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pcont").toString
    // 4 rows, prices 1.00/2.00/3.00/10.00 → p25 sits at rank 0.75:
    // 100 + 0.75·(200−100) = 175 cents = 1750000 e4-dollars·… (cents·100)
    Seq(1.0, 2.0, 3.0, 10.0).map(p => (1L, p))
      .toDF("l_orderkey", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = SparkEntry.queries("q_percentile_cont")(spark, dir)
      .collect().map(r => r.getAs[Long]("pct") -> r.getAs[Long]("value_e4")).toMap
    assert(rows(25L) == 100L * 100 + 100L * 75)  // 1.75 dollars = 17500 e4
    assert(rows(50L) == 250L * 100)              // midpoint of 2.00/3.00
    assert(rows(75L) == 300L * 100 + 700L * 25)  // 3 + 0.25·7 = 4.75
    assert(rows(99L) == 300L * 100 + 700L * 97)  // rank 2.97 → 9.79
  }

  test("mm_vad_segments: islands of above-mean frames count and measure correctly") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-vad").toString
    // doc_id 1 (audio kind): 4 full 16-byte frames — loud, quiet,
    // loud, loud → 2 segments, longest run 2
    val loud = "z" * 16; val quiet = "a" * 16
    Seq((1L, loud + quiet + loud + loud, "en", "s", 64L),
        (4L, quiet * 2, "en", "s", 32L)) // uniform → no frame beats the mean
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("mm_vad_segments")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(1L).getAs[Long]("n_segments") == 2L)
    assert(rows(1L).getAs[Long]("longest_run") == 2L)
    assert(rows(1L).getAs[Long]("n_active") == 3L)
    assert(rows(4L).getAs[Long]("n_active") == 0L && rows(4L).getAs[Long]("n_segments") == 0L)
  }

  test("ev_pagerank_types: a sink state every journey funnels into ranks first, mass conserves") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pagerank").toString
    // every user: view -> click -> purchase, purchase self-loops —
    // purchase must dominate
    val rows = (0L until 30L).flatMap { u =>
      Seq((u * 4, "view", u), (u * 4 + 1, "click", u),
        (u * 4 + 2, "purchase", u), (u * 4 + 3, "purchase", u))
    }.zipWithIndex.map { case ((id, t, u), i) =>
      (id, new java.sql.Timestamp(1700000000000L + i * 1000L), u, t, 1.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("ev_pagerank_types")(spark, dir)
      .collect().sortBy(_.getAs[Int]("rank"))
    assert(out.head.getAs[String]("event_type") == "purchase")
    val total = out.map(_.getAs[Long]("pr_e8")).sum
    // PageRank mass stays ~1 (1e8 grain, rounding slack per round)
    assert(math.abs(total - 100000000L) < 1000L, s"mass drifted to $total")
  }

  test("q_unpivot: three metric rows per flag, values equal the wide aggregate") {
    val spark = TestSpark.spark
    val out = SparkEntry.queries("q_unpivot")(spark, sf).collect()
    val flags = out.map(_.getString(0)).distinct
    assert(out.length == flags.length * 3)
    flags.foreach { f =>
      val ms = out.filter(_.getString(0) == f).map(_.getString(1)).sorted
      assert(ms.sameElements(Array("sum_base_cents", "sum_disc_cents", "sum_qty")))
    }
  }
}
