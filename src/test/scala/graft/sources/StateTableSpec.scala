package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import graft.TestSpark
import graft.events.{Event, Patterns}

class StateTableSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def eventsDf(rows: Seq[(Long, Long)]) = // (id, foreignId)
    rows.map { case (id, fid) =>
      (id, "click", fid, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0, "{}")
    }.toDF("id", "eventType", "foreignId", "ts", "value", "metadata")

  /** file fingerprint per bucket dir: name → (fileName, size) set */
  private def bucketFiles(dir: String): Map[String, Set[(String, Long)]] = {
    val d = new java.io.File(dir)
    if (!d.exists()) Map.empty
    else d.listFiles().filter(_.getName.startsWith("state_bucket=")).map { b =>
      b.getName -> b.listFiles().map(f => (f.getName, f.length())).toSet
    }.toMap
  }

  test("upsert converges to latest-per-entity and matches the full-log reduction") {
    val dir = Files.createTempDirectory("graft-statetable").toString + "/state"
    val table = new StateTable(spark, dir, nBuckets = 16)
    val log = Event.project(spark.read.parquet(s"${TestSpark.sf}/events.parquet"))

    table.upsert(log.filter(col("id") < 500))
    table.upsert(log.filter(col("id") >= 500))

    val expected = Patterns.latestState(log)
    val state = table.read
    assert(state.count() === expected.count())
    val got = state.select("foreignId", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    expected.select("foreignId", "id").collect().foreach { r =>
      assert(got(r.getLong(0)) === r.getLong(1))
    }
  }

  test("a 1-entity batch rewrites exactly one bucket partition") {
    val dir = Files.createTempDirectory("graft-statetable1").toString + "/state"
    val table = new StateTable(spark, dir, nBuckets = 16)
    // seed with many entities so every bucket has data
    table.upsert(eventsDf((0L until 200L).map(i => (i, i))))
    val before = bucketFiles(dir)
    assert(before.size > 1)

    val touched = table.upsert(eventsDf(Seq((1000L, 7L))))
    assert(touched.size === 1)

    val after = bucketFiles(dir)
    val changed = (before.keySet ++ after.keySet).filter(k => before.get(k) != after.get(k))
    assert(changed === Set(s"state_bucket=${touched.head}"))
    // and the merge is correct: entity 7 now maps to id 1000
    val row = table.read.filter(col("foreignId") === 7L).select("id").collect()
    assert(row.map(_.getLong(0)).toSeq === Seq(1000L))
    assert(table.read.count() === 200L)
  }

  test("delete removes one entity, rewriting only its bucket") {
    val dir = Files.createTempDirectory("graft-statetable2").toString + "/state"
    val table = new StateTable(spark, dir, nBuckets = 8)
    table.upsert(eventsDf((0L until 100L).map(i => (i, i))))
    val before = bucketFiles(dir)

    table.delete(42L)
    val after = bucketFiles(dir)
    assert(table.read.filter(col("foreignId") === 42L).isEmpty)
    assert(table.read.count() === 99L)
    val changed = (before.keySet ++ after.keySet).filter(k => before.get(k) != after.get(k))
    assert(changed.size === 1)
  }

  test("upserting an empty batch is a no-op") {
    val dir = Files.createTempDirectory("graft-statetable3").toString + "/state"
    val table = new StateTable(spark, dir, nBuckets = 8)
    assert(table.upsert(eventsDf(Nil)) === Nil)
    assert(!table.exists)
  }
}
