package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The Z-order WRITE path on real files: content round-trips, the
  * written files carry tight footer zones, and a pruning reader skips
  * more row groups under the z layout than under a linear layout for
  * a predicate on the non-sort dimension — counted from the parquet
  * footers themselves (Layout.rowGroupsSkipped), not simulated.
  */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(name: String): String = {
    val p = java.nio.file.Files.createTempDirectory(name)
    p.toFile.deleteOnExit()
    s"$p/out"
  }

  private lazy val li = spark.read.parquet(s"${TestSpark.sf}/lineitem.parquet")
    .select(col("l_orderkey").cast("long").as("ok"),
      col("l_partkey").cast("long").as("pk"),
      col("l_quantity").cast("long").as("qty"))

  test("zorderWrite round-trips content exactly") {
    val out = tmp("graft-zw")
    Layout.zorderWrite(li, "ok", "pk", out, targetFiles = 16)
    val back = spark.read.parquet(out)
    assert(back.count() === li.count())
    // full multiset equality, both directions
    assert(back.exceptAll(li).isEmpty && li.exceptAll(back).isEmpty)
    // helper column must not leak into the written schema
    assert(back.columns.sorted.toSeq === Seq("ok", "pk", "qty"))
  }

  test("z layout prunes the second dimension; linear does not") {
    val zOut = tmp("graft-zw2")
    val lOut = tmp("graft-lw2")
    Layout.zorderWrite(li, "ok", "pk", zOut, targetFiles = 16)
    Layout.linearWrite(li, "ok", lOut, targetFiles = 16)
    val Seq(maxPk) = li.agg(max("pk")).collect().map(_.getLong(0)).toSeq
    // predicate on pk — the dimension linear-by-ok knows nothing about:
    // an eighth of the key space
    val lo = 0L
    val hi = maxPk / 8
    val (zSkip, zTotal) = Layout.rowGroupsSkipped(spark, zOut, "pk", lo, hi)
    val (lSkip, lTotal) = Layout.rowGroupsSkipped(spark, lOut, "pk", lo, hi)
    assert(zTotal >= 16 && lTotal >= 16)
    // linear files all span ~the full pk range → ~zero skippable;
    // z-order tiles must make at least half the row groups skippable
    assert(zSkip * 2 >= zTotal,
      s"zorder skipped only $zSkip of $zTotal row groups")
    assert(zSkip > lSkip,
      s"zorder ($zSkip/$zTotal) must out-prune linear ($lSkip/$lTotal)")
    // and the sort dimension still prunes under z (coarser than
    // linear's perfect pruning, but real): an ok-range predicate
    val Seq(maxOk) = li.agg(max("ok")).collect().map(_.getLong(0)).toSeq
    val (zSkipOk, _) = Layout.rowGroupsSkipped(spark, zOut, "ok", 0L, maxOk / 8)
    assert(zSkipOk > 0)
  }

  test("3-dim zorderWrite prunes on every clustered key") {
    val out = tmp("graft-zw3d")
    Layout.zorderWrite(li, Seq("ok", "pk", "qty"), out, targetFiles = 16)
    val back = spark.read.parquet(out)
    assert(back.count() === li.count())
    assert(back.exceptAll(li).isEmpty)
    // an eighth-of-range predicate on EACH dim must skip row groups
    Seq("ok", "pk", "qty").foreach { c =>
      val mx = li.agg(max(c)).collect()(0).getLong(0)
      val (skip, total) = Layout.rowGroupsSkipped(spark, out, c, 0L, mx / 8)
      assert(skip > 0, s"3-dim z-order skipped nothing on $c (0/$total)")
    }
  }

  test("fileZones reports footer stats consistent with the data") {
    val out = tmp("graft-zw3")
    Layout.zorderWrite(li, "ok", "pk", out, targetFiles = 8)
    val zones = Layout.fileZones(spark, out, Seq("ok", "pk"))
    assert(zones.map(_._3).sum === li.count())
    val (mnOk, mxOk) = (zones.map(_._2("ok")._1).min, zones.map(_._2("ok")._2).max)
    val row = li.agg(min("ok"), max("ok")).collect()(0)
    assert(mnOk === row.getLong(0) && mxOk === row.getLong(1))
  }
}
