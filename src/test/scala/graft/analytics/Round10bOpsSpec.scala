package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

/** Planted-defect pins for the round-10b operators: the oracle gate
  * proves cross-engine parity on clean data; these prove the ops
  * actually DETECT what they audit — a planted FK orphan and PK dup
  * (q_fk_audit), a dominant onboarding path (ev_funnel_paths), the
  * epoch-day dow formula (ev_seasonality), and separated vs collapsed
  * clusters (ann_silhouette).
  */
class Round10bOpsSpec extends AnyFunSuite {

  private def spark = graft.TestSpark.spark

  test("q_fk_audit counts a planted orphan FK and a planted dup PK") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-fk").toString
    Seq((0L, "AMERICA", "")).toDF("r_regionkey", "r_name", "r_comment")
      .write.parquet(s"$dir/region.parquet")
    Seq((0L, "US", 0L, "")).toDF("n_nationkey", "n_name", "n_regionkey", "n_comment")
      .write.parquet(s"$dir/nation.parquet")
    // planted PK dup: custkey 1 twice
    Seq((1L, "a", 0L), (1L, "a2", 0L), (2L, "b", 0L))
      .toDF("c_custkey", "c_name", "c_nationkey")
      .write.parquet(s"$dir/customer.parquet")
    Seq((1L, "s", 0L)).toDF("s_suppkey", "s_name", "s_nationkey")
      .write.parquet(s"$dir/supplier.parquet")
    Seq((1L, "p")).toDF("p_partkey", "p_name")
      .write.parquet(s"$dir/part.parquet")
    // planted orphan: o_custkey 99 has no customer row
    Seq((10L, 1L), (11L, 99L)).toDF("o_orderkey", "o_custkey")
      .write.parquet(s"$dir/orders.parquet")
    // planted orphans: one bad orderkey, one bad partkey
    Seq((10L, 1L, 1L, 1L), (77L, 1L, 1L, 1L), (11L, 9L, 1L, 2L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
      .write.parquet(s"$dir/lineitem.parquet")
    val got = graft.SparkEntry.queries("q_fk_audit")(s, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("fk:orders.o_custkey") == (2L, 1L))
    assert(got("fk:lineitem.l_orderkey") == (3L, 1L)) // orderkey 77
    assert(got("fk:lineitem.l_partkey") == (3L, 1L))  // partkey 9
    assert(got("pk:customer") == (3L, 1L))
    assert(got("pk:lineitem") == (3L, 0L))
    assert(got("fk:nation.n_regionkey") == (1L, 0L))
  }

  test("ev_funnel_paths ranks the dominant first-5 path and caps at 5 events") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-paths").toString
    def e(id: Long, uid: Long, sec: Long, t: String) =
      (id, new java.sql.Timestamp(1700000000000L + sec * 1000L), uid, t, 1.0, "{}")
    // users 1..3 follow signup>browse; user 4 has 7 events (only the
    // first 5 — a>b>c>d>e — may appear in its path)
    val rows =
      (1L to 3L).flatMap(u => Seq(e(u * 10, u, u, "signup"), e(u * 10 + 1, u, u + 100, "browse"))) ++
        Seq("a", "b", "c", "d", "e", "f", "g").zipWithIndex.map {
          case (t, i) => e(100L + i, 4L, 1000L + i, t)
        }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = graft.SparkEntry.queries("ev_funnel_paths")(s, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.head == ("signup>browse", 3L))
    assert(got.toMap.apply("a>b>c>d>e") == 1L)
    assert(!got.exists(_._1.contains("f")))
  }

  test("ev_seasonality: epoch-day dow math (1970-01-01 = Thursday = 4) and exact shares") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-season").toString
    // 1970-01-01 02:xx (Thursday, hour 2) three times; 1970-01-04
    // (Sunday, dow 0) hour 23 once
    val rows = Seq(
      (1L, new java.sql.Timestamp(2 * 3600 * 1000L), 1L, "login", 1.0, "{}"),
      (2L, new java.sql.Timestamp((2 * 3600 + 60) * 1000L), 2L, "login", 1.0, "{}"),
      (3L, new java.sql.Timestamp((2 * 3600 + 120) * 1000L), 3L, "login", 1.0, "{}"),
      (4L, new java.sql.Timestamp((3 * 86400 + 23 * 3600) * 1000L), 1L, "login", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = graft.SparkEntry.queries("ev_seasonality")(s, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSet == Set(
      ("login", 4L, 2L, 3L, 7500L),   // Thursday 02:00, 3 of 4 = 7500 bp
      ("login", 0L, 23L, 1L, 2500L))) // Sunday 23:00
  }

  test("ev_type_affinity computes exact pairwise Jaccard in basis points") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-aff").toString
    // users of a = {1,2,3}, b = {2,3}, c = {3}
    val rows = Seq((1L, "a"), (2L, "a"), (3L, "a"), (2L, "b"), (3L, "b"), (3L, "c"))
      .zipWithIndex.map { case ((u, t), i) =>
        (i.toLong, new java.sql.Timestamp(1700000000000L + i * 1000L), u, t, 1.0, "{}")
      }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = graft.SparkEntry.queries("ev_type_affinity")(s, dir)
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      ("a", "b") -> (2L, 6666L),  // 2/(3+2-2)
      ("a", "c") -> (1L, 3333L),  // 1/(3+1-1)
      ("b", "c") -> (1L, 5000L))) // 1/(2+1-1)
  }

  test("ev_power_users matches the brute-force sorted definition") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-power").toString
    val rnd = new scala.util.Random(11)
    // 120 users with skewed activity (1..~200 events each)
    val perUser = (1 to 120).map(u => u.toLong -> (1 + rnd.nextInt(u + 3)))
    val rows = perUser.flatMap { case (u, n) => (0 until n).map(i => (u, i)) }
      .zipWithIndex.map { case ((u, _), i) =>
        (i.toLong, new java.sql.Timestamp(1700000000000L + i * 1000L), u, "e", 1.0, "{}")
      }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val r = graft.SparkEntry.queries("ev_power_users")(s, dir).collect().head
    // brute force from the planted counts
    val cs = perUser.map(_._2.toLong).sorted
    val n = cs.size.toLong; val t = cs.sum
    val sAsc = cs.zipWithIndex.map { case (c, i) => c * (i + 1L) }.sum
    val desc = cs.reverse
    def topShare(k: Int): Long = desc.take(k).sum * 10000L / t
    assert(r.getLong(0) == n && r.getLong(1) == t)
    assert(r.getLong(2) == topShare(((n + 99) / 100).toInt))
    assert(r.getLong(3) == topShare(((n + 9) / 10).toInt))
    assert(r.getLong(4) == (2 * sAsc - (n + 1) * t) * 10000L / (n * t))
  }

  test("ann_silhouette separates orthogonal clusters and flags collapsed ones") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sil").toString
    val rnd = new scala.util.Random(5)
    def jitter(base: Array[Float]): Array[Float] =
      base.map(v => v + (rnd.nextFloat() - 0.5f) * 0.01f)
    // labels 0/1: orthogonal axes in the first 8 dims → separated.
    // labels 2/3: the SAME direction → their centroids coincide, so
    // a ≈ b and margins hover at zero (not separated by +margin).
    val axis0 = Array.fill(8)(0f).updated(0, 1f)
    val axis1 = Array.fill(8)(0f).updated(1, 1f)
    val shared = Array.fill(8)(0f).updated(2, 1f).updated(3, 1f)
    val rows =
      (0 until 20).map(i => (i.toLong, jitter(axis0), 0)) ++
        (0 until 20).map(i => (100L + i, jitter(axis1), 1)) ++
        (0 until 20).map(i => (200L + i, jitter(shared), 2)) ++
        (0 until 20).map(i => (300L + i, jitter(shared), 3))
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val got = graft.SparkEntry.queries("ann_silhouette")(s, dir)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(0)._1 == 20L && got(0)._3 == 20L && got(0)._2 > 20L * 5000L,
      "orthogonal cluster 0 should separate with a large margin")
    assert(got(1)._3 == 20L)
    assert(got(2)._2 < 20L * 100L && got(3)._2 < 20L * 100L,
      "collapsed clusters should have near-zero summed margin")
  }
}
