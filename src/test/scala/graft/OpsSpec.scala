package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Operator-level invariants that the DuckDB oracle can't express. */
class OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("every declared query runs and q keys have unique names") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.size === names.distinct.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(names.toSet))
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("ev_active_users plans no nested-loop range join (anchor-explode WAU)") {
    val df = SparkEntry.queries("ev_active_users")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // and stays correct: every WAU ≥ its DAU (7-day superset of 1 day)
    val bad = df.filter(col("wau") < col("dau")).count()
    assert(bad === 0L)
  }

  test("C19/B21: corpus-sized windows are partitioned; unpartitioned windows only see block aggregates") {
    // two-level prefix sums: the only unpartitioned windows allowed are
    // the tiny cumulative-offset passes over per-block AGGREGATES —
    // never a window that sorts the raw table into one partition
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Seq("tx_token_shards", "q_ntile_custspend").foreach { q =>
        val plan = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan
        val wins = plan.collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
        assert(wins.exists(_.partitionSpec.nonEmpty), s"$q: expected a partitioned local window")
        wins.filter(_.partitionSpec.isEmpty).foreach { w =>
          val okBelow = w.child.collectFirst {
            case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
            // r16: the Prefix.cumExcl small path windows over a
            // CHECKPOINTED block-aggregate frame — the aggregate ran
            // in the eager checkpoint job, and the frame's size was
            // MEASURED against spark.graft.prefix.broadcastMaxRows
            // before the window form was chosen (a stronger guarantee
            // than this structural check)
            case r: org.apache.spark.sql.execution.RDDScanExec => r
          }
          assert(okBelow.isDefined,
            s"$q: unpartitioned window must consume block-aggregated rows, not the raw table")
        }
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("multimodal: a custom MediaCodec plugs into the decode plumbing") {
    import graft.multimodal.MultimodalOps
    // a "codec" that reports constant features — proves decode() is
    // codec-blind and the partition open/decode lifecycle runs
    object FixedCodec extends MultimodalOps.MediaCodec {
      def decode(kind: String, payload: Array[Byte]): MultimodalOps.MediaFeatures =
        MultimodalOps.MediaFeatures(payload.length, 42.0, Seq(1L, 2L, 3L, 4L), 7)
    }
    val media = MultimodalOps.asMedia(
      spark.read.parquet(s"$sf/documents.parquet")).limit(20)
    val out = MultimodalOps.decode(media, FixedCodec).collect()
    assert(out.length === 20)
    assert(out.forall(_.getAs[Double]("mean_byte") === 42.0))
    assert(out.forall(_.getAs[Int]("n_frames") === 7))
    // and the stub path still derives real byte statistics
    val stub = MultimodalOps.fakeDecode(media).collect()
    assert(stub.forall(r => r.getAs[Int]("byte_len") > 0))
  }

  test("ann: similarities are valid cosines and exclude self-matches") {
    val rows = SparkEntry.queries("ann_bruteforce")(spark, sf).collect()
    rows.foreach { r =>
      val c = r.getAs[Double]("cos_sim")
      assert(c >= -1.0001 && c <= 1.0001)
      assert(r.getAs[Long]("probe") !== r.getAs[Long]("neighbor"))
    }
  }

  test("embed near-dup pairs respect the threshold and ordering") {
    val rows = SparkEntry.queries("dd_embed_neardup")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("cos_sim") >= 0.28)
      assert(r.getAs[Long]("a") < r.getAs[Long]("b"))
    }
  }

  test("ann_range returns exactly the above-floor neighbors, no self-matches") {
    val rows = SparkEntry.queries("ann_range")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("cos_sim") >= 0.30)
      assert(r.getAs[Long]("probe") !== r.getAs[Long]("neighbor"))
      assert(r.getAs[Long]("probe") < 16)
    }
    // completeness vs the exact top-k path: any bruteforce hit for a
    // shared probe that clears the floor must be in the range result
    val range = rows.map(r => (r.getAs[Long]("probe"), r.getAs[Long]("neighbor"))).toSet
    SparkEntry.queries("ann_bruteforce")(spark, sf)
      .filter(col("probe") < 16 && col("cos_sim") >= 0.30).collect()
      .foreach { r =>
        assert(range.contains((r.getAs[Long]("probe"), r.getAs[Long]("neighbor"))))
      }
  }

  test("ann_bruteforce neighbors are ranked by descending similarity") {
    val rows = SparkEntry.queries("ann_bruteforce")(spark, sf)
      .filter(col("probe") === 0).orderBy("rk").collect()
    val sims = rows.map(_.getAs[Double]("cos_sim"))
    assert(sims.toSeq === sims.sortBy(-_).toSeq)
    assert(rows.length === 10)
  }

  test("minhash LSH candidates have valid jaccard in [0,1]") {
    val rows = SparkEntry.queries("dd_minhash_lsh")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.0 && j <= 1.0)
      assert(r.getAs[Long]("a") < r.getAs[Long]("b"))
    }
  }

  test("simhash hamming distances are within [0,64]") {
    val rows = SparkEntry.queries("dd_simhash")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Int]("hamming")
      assert(h >= 0 && h <= 64)
    }
  }

  test("exact dedup canonical ids are group minima") {
    val rows = SparkEntry.queries("dd_exact")(spark, sf).collect()
    rows.foreach(r => assert(r.getAs[Long]("canonical_id") <= r.getAs[Long]("doc_id")))
  }

  test("multimodal stub decode is deterministic and schema-stable") {
    val a = SparkEntry.queries("mm_decode_stub")(spark, sf).collect()
    val b = SparkEntry.queries("mm_decode_stub")(spark, sf).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    assert(a.length > 0)
  }

  test("sketch aggregates land within tolerance of exact values") {
    val sk = SparkEntry.queries("q_sketch_aggs")(spark, sf).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r).toMap
    val exact = SparkEntry.queries("q_distinct_parts")(spark, sf).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("n_parts")).toMap
    exact.foreach { case (flag, n) =>
      val row = sk(flag)
      // the exact column must agree with the independently computed
      // count, and every bounded-error flag must hold (the same
      // booleans the SQL oracle pins to TRUE)
      assert(row.getAs[Long]("exact_parts") === n)
      assert(row.getAs[Boolean]("parts_ok"), s"$flag: HLL outside 5% of $n")
      assert(row.getAs[Boolean]("p50_ok"), s"$flag: p50 outside rank bound")
      assert(row.getAs[Boolean]("p95_ok"), s"$flag: p95 outside rank bound")
    }
  }

  test("media embedding stub neighbors are valid and deterministic") {
    val a = SparkEntry.queries("mm_embed_ann")(spark, sf).collect()
    val b = SparkEntry.queries("mm_embed_ann")(spark, sf).collect()
    assert(a.nonEmpty)
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
  }

  test("fake decoder histogram buckets sum to the payload length") {
    val rows = multimodal.MultimodalOps.fakeDecode(
      multimodal.MultimodalOps.asMedia(
        spark.read.parquet(s"$sf/documents.parquet"))).collect()
    rows.foreach { r =>
      val histSum = r.getAs[Seq[Long]]("hist").sum
      assert(histSum === r.getAs[Int]("byte_len").toLong)
    }
  }

  test("type transition counts cover exactly n_events - n_users") {
    val trans = SparkEntry.queries("ev_type_transitions")(spark, sf)
      .agg(sum("n")).collect()(0).getLong(0)
    val nEvents = spark.read.parquet(s"$sf/events.parquet").count()
    val nUsers = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id").distinct().count()
    assert(trans === nEvents - nUsers) // each user's first event has no prev
  }

  test("langid prediction is one of the marker languages") {
    val langs = SparkEntry.queries("tx_langid")(spark, sf)
      .select("pred_lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "es", "de", "fr")))
  }
}
