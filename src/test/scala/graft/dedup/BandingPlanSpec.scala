package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r13 (r12 verdict item 9): the dd_lsh_plan banding table and the
  * minhash operator consume ONE selection. Pins (a) chooseBanding's
  * defaults and S-curve positions, (b) query-vs-operator agreement on
  * the `best` row under two targets, and (c) the end-to-end effect:
  * moving the Jaccard target moves the operator's admitted candidate
  * set along the S-curve (a lower threshold admits a strict superset
  * — structurally guaranteed, since an r=8 band collision is two
  * r=4 band collisions of the same signature).
  */
class BandingPlanSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def withTarget[A](t: Option[String])(f: => A): A = {
    val key = graft.GraftConf.DedupMinhashTargetJ.key
    val prev = spark.conf.getOption(key)
    try { t.foreach(spark.conf.set(key, _)); if (t.isEmpty) spark.conf.unset(key); f }
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("chooseBanding: default target keeps the measured 4x8 point; 0.5 shifts to 8x4") {
    assert(DedupOps.chooseBanding(32, 0.8) === ((4, 8)))
    assert(DedupOps.chooseBanding(32, 0.5) === ((8, 4)))
    assert(DedupOps.chooseBanding(32, 0.95) === ((2, 16)))
  }

  test("dd_lsh_plan's best row equals the operator's chooseBanding, both targets") {
    // default target: through the graded query (which requires the
    // default — its DuckDB oracle is static); non-default: through
    // the parameterized lshPlanTable the graded query delegates to
    withTarget(None) {
      val best = graft.SparkEntry.queries("dd_lsh_plan")(spark, graft.TestSpark.sf)
        .filter(col("best")).select("b", "r").collect()
      assert(best.length === 1)
      val (b, r) = DedupOps.configuredBanding(spark)
      assert((best(0).getInt(0), best(0).getInt(1)) === ((b, r)))
    }
    withTarget(Some("0.5")) {
      val best = DedupOps.lshPlanTable(spark, 0.5)
        .filter(col("best")).select("b", "r").collect()
      assert(best.length === 1)
      val (b, r) = DedupOps.configuredBanding(spark)
      assert((best(0).getInt(0), best(0).getInt(1)) === ((b, r)))
    }
  }

  test("graded dd_lsh_plan fails loudly under a non-default target (r13 ADVICE)") {
    withTarget(Some("0.5")) {
      val e = intercept[IllegalArgumentException] {
        graft.SparkEntry.queries("dd_lsh_plan")(spark, graft.TestSpark.sf).collect()
      }
      assert(e.getMessage.contains("lshPlanTable"))
    }
  }

  test("moving the target shifts the admitted candidate set along the S-curve") {
    // mid-similarity corpus: base docs plus ~0.5-0.7-Jaccard variants
    // (append a tail that shares most 4-gram shingles)
    val words = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima")
    val docs = (0 until 40).flatMap { i =>
      val base = (0 until 12).map(j => words((i * 7 + j * 3) % words.length))
        .mkString(" ")
      val variant = base.split(" ").take(8).mkString(" ") + " " +
        (0 until 4).map(j => words((i * 5 + j * 11 + 1) % words.length)).mkString(" ")
      Seq((i.toLong, base), (1000L + i, variant))
    }.toDF("doc_id", "text")

    def admitted(target: String): Set[(Long, Long)] = withTarget(Some(target)) {
      DedupOps.minhashPairs(docs, maxBucket = 500)
        .select("a", "b").as[(Long, Long)].collect().toSet
    }
    val at08 = admitted("0.8") // 4 bands x 8 rows: thr ~0.84
    val at05 = admitted("0.5") // 8 bands x 4 rows: thr ~0.59
    assert(at08.subsetOf(at05),
      s"r=8 collisions must be r=4 collisions too; missing: ${at08 -- at05}")
    assert(at05.size > at08.size,
      s"lower threshold must admit strictly more mid-J candidates " +
        s"(at05=${at05.size}, at08=${at08.size})")
  }
}
