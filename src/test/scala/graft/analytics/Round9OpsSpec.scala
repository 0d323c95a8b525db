package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Property pins for the round-9 operator kernels: each decomposed /
  * no-sort formulation must equal the obvious brute-force definition
  * on seeded random data. (The oracle gate proves cross-engine parity;
  * these prove the FORMULATION — two-level prefix sweep, histogram
  * quantiles, snake permutation, Morton interleave — against first
  * principles.)
  */
class Round9OpsSpec extends AnyFunSuite {

  private def spark = graft.TestSpark.spark

  test("ev_concurrency equals brute-force interval overlap counting") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    // events across 4 days incl. midnight stragglers
    val ts = (1 to 400).map(_ => 1700000000L + rnd.nextInt(4 * 86400)).sorted
    val dir = java.nio.file.Files.createTempDirectory("graft-conc").toString
    ts.zipWithIndex.map { case (es, i) =>
      (i.toLong, new java.sql.Timestamp(es * 1000L), i.toLong % 7, "login", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.SparkEntry.queries("ev_concurrency")(s, dir)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    // brute force: at every boundary instant, count open [t, t+1800)
    val bounds = ts.flatMap(t => Seq((t, 1), (t + 1800L, -1)))
      .groupBy(_._1).map { case (t, ds) => (t, ds.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    var live = 0L
    val perDay = scala.collection.mutable.Map.empty[String, Long]
    bounds.foreach { case (t, dlt) =>
      live += dlt
      val day = java.time.LocalDate.ofEpochDay(Math.floorDiv(t, 86400L)).toString
      perDay(day) = math.max(perDay.getOrElse(day, Long.MinValue), live)
    }
    assert(got == perDay.toMap)
  }

  test("tx_length_quantiles matches the sort-based percentile definition") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val docs = (0 until 300).map { i =>
      val n = 1 + rnd.nextInt(120)
      (i.toLong, Seq.fill(n)("w").mkString(" "), "en", s"src${i % 3}", n.toLong)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-lenq").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("tx_length_quantiles")(s, dir)
      .collect().map(r => (r.getString(0), (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    def pct(vs: Seq[Long], q: Int): Long = {
      val sorted = vs.sorted
      val n = sorted.size
      // smallest v with cum*100 >= q*n  ==  element at ceil(q*n/100) - 1
      sorted((q * n + 99) / 100 - 1)
    }
    docs.groupBy(_._4).foreach { case (src, ds) =>
      val lens = ds.map(_._5)
      assert(got(src) == ((pct(lens, 50), pct(lens, 90), pct(lens, 99))),
        s"quantiles diverge for $src")
    }
  }

  test("q_equidepth buckets equal the brute-force cumulative rule") {
    val s = spark
    val sfDir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q_equidepth")(s, sfDir).collect()
    assert(rows.map(_.getInt(0)).toSeq == rows.map(_.getInt(0)).toSeq.sorted)
    val total = rows.map(_.getLong(3)).sum
    // brute force over the raw column
    val vs = graft.Tables.lineitem(s, sfDir)
      .select(round(col("l_extendedprice") * 100).cast("long").as("v"))
      .collect().map(_.getLong(0)).sorted
    assert(total == vs.length)
    // every distinct value must land in bucket floor(cumExcl*8/total)
    val byV = vs.groupBy(identity).map { case (v, g) => (v, g.length.toLong) }
    var cum = 0L
    val expected = byV.toSeq.sortBy(_._1).map { case (v, cnt) =>
      val b = (cum * 8) / total; cum += cnt; (v, b)
    }.toMap
    rows.foreach { r =>
      val (b, lo, hi) = (r.getInt(0).toLong, r.getDouble(1), r.getDouble(2))
      val loV = math.round(lo * 100)
      val hiV = math.round(hi * 100)
      assert(expected(loV) == b && expected(hiV) == b)
    }
  }

  test("OPQ snake assignment is a balanced permutation with tighter spread") {
    val s = spark
    val rows = graft.SparkEntry.queries("ann_opq_permute")(s, "/root/testdata/sf0.001").collect()
    assert(rows.length == 8)
    val naive = rows.map(_.getLong(1))
    val opq = rows.map(_.getLong(2))
    // both assignments partition the same total energy
    assert(naive.sum == opq.sum)
    // snake-dealing ranked dims can never widen the max-min spread
    assert(opq.max - opq.min <= naive.max - naive.min)
  }

  test("doremi reweighting moves mass toward above-average-loss sources") {
    val s = spark
    val rows = graft.SparkEntry.queries("pipeline_doremi_mix")(s, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // weights stay a (rounded) distribution
    assert(math.abs(rows.map(_._3).sum - 1.0) < 0.01)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 0.01)
    // multiplicative weights: the max-loss source never loses mass,
    // the min-loss source never gains (ties aside)
    val byLoss = rows.sortBy(_._2)
    assert(byLoss.last._4 >= byLoss.last._3 - 1e-9,
      s"max-loss source lost mass: ${byLoss.last}")
    assert(byLoss.head._4 <= byLoss.head._3 + 1e-9,
      s"min-loss source gained mass: ${byLoss.head}")
  }

  test("dedup threshold curve is monotone non-increasing") {
    val s = spark
    val rows = graft.SparkEntry.queries("dd_threshold_curve")(s, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(50L, 60L, 70L, 80L, 90L).take(rows.length))
    rows.toSeq.sliding(2).foreach {
      case Seq((_, a), (_, b)) => assert(a >= b, s"curve not monotone: ${rows.toSeq}")
      case _ =>
    }
  }

  test("ev_trending equals brute-force power-of-two decay") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val base = 1700000000L
    val evs = (1 to 300).map { i =>
      (i.toLong, new java.sql.Timestamp((base + rnd.nextInt(40 * 86400)) * 1000L),
        i.toLong % 5, if (i % 3 == 0) "login" else "view", 1.0, "{}")
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-trend").toString
    evs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.SparkEntry.queries("ev_trending")(s, dir)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    val days = evs.map(e => (e._4, e._2.getTime / 1000L / 86400L))
    val maxDay = days.map(_._2).max
    val expected = days.groupBy(_._1).map { case (t, ds) =>
      t -> ds.map { case (_, day) =>
        val age = maxDay - day
        if (age <= 30) (1L << (30 - age).toInt) else 0L
      }.sum
    }
    assert(got == expected)
  }

  test("Morton interleave in q_zorder matches a reference bit-interleave") {
    // the same arithmetic the query builds, pinned to a direct
    // bit-by-bit reference on the full 8-bit domain corners + randoms
    def morton(x: Long, y: Long): Long = {
      var z = 0L
      (0 until 8).foreach { i =>
        z |= ((x >> i) & 1L) << (2 * i)
        z |= ((y >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    def viaSumForm(x: Long, y: Long): Long =
      (0 until 8).map { i =>
        (((x >> i) & 1L) * (1L << (2 * i))) + (((y >> i) & 1L) * (1L << (2 * i + 1)))
      }.sum
    val rnd = new scala.util.Random(3)
    val pts = Seq((0L, 0L), (255L, 255L), (255L, 0L), (0L, 255L)) ++
      Seq.fill(200)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    pts.foreach { case (x, y) =>
      assert(morton(x, y) == viaSumForm(x, y))
      assert(viaSumForm(x, y) < 65536L)
    }
    // locality: a 64-file cut of the z-range is a 32x32 tile grid —
    // both coordinates of two codes in the same file differ < 32 only
    // if their top-6 z bits agree; spot-check the tile bound
    pts.foreach { case (x, y) =>
      val file = morton(x, y) / 1024L
      val tileX = (x / 32L) // tiles are 32 wide in x
      val tileY = (y / 32L)
      assert(file == morton(tileX * 32, tileY * 32) / 1024L)
    }
  }
}
