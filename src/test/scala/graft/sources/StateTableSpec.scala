package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import graft.TestSpark
import graft.events.{Event, Patterns}

class StateTableSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // event frames fabricated through the public test harness
  // (graft.testkit.TestStreamer — the reference's testmock surface)
  private def eventsDf(rows: Seq[(Long, Long)]) = { // (id, foreignId)
    val ts = graft.testkit.TestStreamer(spark)
    rows.foreach { case (id, fid) =>
      ts.insertEvent(id, "click", fid,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0, "{}")
    }
    ts.log.df.drop("trace")
  }

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

  test("merge default = upsert replace semantics; untouched buckets untouched") {
    val dir = Files.createTempDirectory("graft-merge1").toString + "/state"
    val table = new StateTable(spark, dir, nBuckets = 8)
    table.upsert(eventsDf((0L until 50L).map(i => (i, i % 10))))
    val before = bucketFiles(dir)
    // one entity updated → its row replaced by the newer source row
    table.merge(eventsDf(Seq((100L, 3L))))
    assert(table.read.filter(col("foreignId") === 3L)
      .select("id").collect().map(_.getLong(0)).toSeq === Seq(100L))
    assert(table.read.count() === 10L)
    val after = bucketFiles(dir)
    val changed = (before.keySet ++ after.keySet).filter(k => before.get(k) != after.get(k))
    assert(changed.size === 1)
  }

  test("merge matched-delete clause tombstones entities (conditional)") {
    val dir = Files.createTempDirectory("graft-merge2").toString + "/state"
    val table = new StateTable(spark, dir, nBuckets = 8)
    table.upsert(eventsDf((0L until 20L).map(i => (i, i))))
    // delete only the matched rows whose SOURCE event is a tombstone type
    val tombstones = Seq((100L, "forget", 5L), (101L, "click", 6L))
      .map { case (id, t, fid) =>
        (id, t, fid, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0, "{}") }
      .toDF("id", "eventType", "foreignId", "ts", "value", "metadata")
    table.merge(tombstones,
      whenMatched = StateTable.WhenMatched(
        condition = Some(col("source.eventType") === "forget"), delete = true),
      insertNotMatched = false)
    assert(table.read.filter(col("foreignId") === 5L).isEmpty)
    // fid 6: matched but condition false → row kept UNCHANGED (id 6, not 101)
    assert(table.read.filter(col("foreignId") === 6L)
      .select("id").collect().map(_.getLong(0)).toSeq === Seq(6L))
    assert(table.read.count() === 19L)
  }

  test("merge update-set expressions combine target and source columns") {
    val dir = Files.createTempDirectory("graft-merge3").toString + "/state"
    val table = new StateTable(spark, dir, nBuckets = 8)
    table.upsert(eventsDf(Seq((1L, 7L), (2L, 8L))))
    val batch = Seq((10L, 7L), (11L, 9L)).map { case (id, fid) =>
      (id, "click", fid, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), 5.0, "{}")
    }.toDF("id", "eventType", "foreignId", "ts", "value", "metadata")
    // accumulator semantics: value adds up, id advances; other columns
    // keep the TARGET value when a set clause is present
    table.merge(batch,
      whenMatched = StateTable.WhenMatched(set = Map(
        "value" -> (col("target.value") + col("source.value")),
        "id" -> col("source.id"))))
    val row7 = table.read.filter(col("foreignId") === 7L)
      .select("id", "value", "ts").collect()(0)
    assert(row7.getLong(0) === 10L)
    assert(row7.getDouble(1) === 6.0) // 1.0 + 5.0
    assert(row7.getTimestamp(2) === java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    // fid 9 was not matched → inserted as-is
    assert(table.read.filter(col("foreignId") === 9L)
      .select("value").collect()(0).getDouble(0) === 5.0)
    assert(table.read.count() === 3L)
  }

  test("merge matched-delete with a NULL condition keeps the row (MERGE three-valued logic)") {
    val dir = Files.createTempDirectory("graft-merge5").toString + "/state"
    val table = new StateTable(spark, dir, nBuckets = 8)
    table.upsert(eventsDf((0L until 5L).map(i => (i, i))))
    // source row for fid 2 has a NULL eventType: the delete condition
    // evaluates to NULL, which must behave as NOT-fired (row kept),
    // not propagate into the filter and drop the row
    val batch = Seq((100L, null.asInstanceOf[String], 2L))
      .map { case (id, t, fid) =>
        (id, t, fid, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0, "{}") }
      .toDF("id", "eventType", "foreignId", "ts", "value", "metadata")
    table.merge(batch,
      whenMatched = StateTable.WhenMatched(
        condition = Some(col("source.eventType") === "forget"), delete = true),
      insertNotMatched = false)
    // fid 2 kept UNCHANGED (condition did not hold)
    assert(table.read.filter(col("foreignId") === 2L)
      .select("id").collect().map(_.getLong(0)).toSeq === Seq(2L))
    assert(table.read.count() === 5L)
  }

  test("merge tolerates schema drift in both directions (missing / extra source columns)") {
    val dir = Files.createTempDirectory("graft-merge6").toString + "/state"
    val table = new StateTable(spark, dir, nBuckets = 8)
    // state written with a trace column the incoming batch lacks
    table.upsert(eventsDf(Seq((1L, 7L), (2L, 8L))).withColumn("trace", lit("t0")))
    table.merge(eventsDf(Seq((10L, 7L))))
    val r7 = table.read.filter(col("foreignId") === 7L).select("id", "trace").collect()(0)
    assert(r7.getLong(0) === 10L)
    assert(r7.isNullAt(1)) // replace semantics: source row (trace absent → null)
    // and the other direction: source carries a column the state lacks
    // (read back with mergeSchema: only rewritten buckets carry it)
    table.merge(eventsDf(Seq((20L, 9L))).withColumn("extra", lit(5L)))
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet.contains("extra"))
    assert(merged.filter(col("foreignId") === 9L)
      .select("extra").collect()(0).getLong(0) === 5L)
  }

  test("merge full-sync: deleteNotMatchedBySource reconciles to the source snapshot") {
    val dir = Files.createTempDirectory("graft-merge4").toString + "/state"
    val table = new StateTable(spark, dir, nBuckets = 8)
    table.upsert(eventsDf((0L until 30L).map(i => (i, i))))
    // snapshot keeps only even entities
    val snapshot = eventsDf((0L until 30L).filter(_ % 2 == 0).map(i => (i + 100L, i)))
    table.merge(snapshot, deleteNotMatchedBySource = true)
    assert(table.read.count() === 15L)
    assert(table.read.filter(col("foreignId") % 2 === 1).isEmpty)
    assert(table.read.filter(col("foreignId") === 4L)
      .select("id").collect().map(_.getLong(0)).toSeq === Seq(104L))
  }

  test("merge rejects set-expressions that would move rows between buckets") {
    val dir = Files.createTempDirectory("graft-merge5").toString + "/state"
    val table = new StateTable(spark, dir, nBuckets = 8)
    table.upsert(eventsDf(Seq((0L, 0L), (1L, 1L))))
    // rewriting the key could rehash a row into a bucket the swap
    // never touches — silent row loss; the API must refuse
    intercept[IllegalArgumentException] {
      table.merge(eventsDf(Seq((2L, 0L))),
        StateTable.WhenMatched(set = Map("foreignId" -> lit(99L))))
    }
    intercept[IllegalArgumentException] {
      table.merge(eventsDf(Seq((2L, 0L))),
        StateTable.WhenMatched(set = Map("state_bucket" -> lit(3))))
    }
    // and the refused merges left the state untouched
    assert(table.read.count() === 2L)
  }

  test("expire drops rows below the age cutoff, rewriting only buckets that held them") {
    val dir = Files.createTempDirectory("graft-statetable-exp").toString + "/state"
    val table = new StateTable(spark, dir, nBuckets = 8)
    // three "batches" of streaming state rows with src_batch provenance
    def batch(ids: Range, b: Long) = ids.map(i =>
      (i.toLong, i.toLong, b)).toDF("foreignId", "id", "src_batch")
    table.upsert(batch(0 until 40, 0L))
    table.upsert(batch(100 until 140, 1L))
    table.upsert(batch(200 until 240, 2L))
    assert(table.read.count() === 120L)
    val before = bucketFiles(dir)

    // expire everything older than batch 1 (trailing-window dedup)
    val touched = table.expire(cutoff = 1L)
    assert(touched.nonEmpty)
    val remaining = table.read
    assert(remaining.count() === 80L)
    assert(remaining.filter(col("src_batch") < 1L).isEmpty)
    // only buckets that actually contained batch-0 rows were rewritten
    val after = bucketFiles(dir)
    val changed = (before.keySet ++ after.keySet)
      .filter(k => before.get(k) != after.get(k))
    assert(changed === touched.map(b => s"state_bucket=$b").toSet)
    // idempotent: nothing else below the cutoff → no-op
    assert(table.expire(cutoff = 1L) === Nil)
    // an expired key re-admits on the next upsert (the documented
    // windowed-dedup semantic)
    table.upsert(batch(0 until 10, 3L))
    assert(table.read.filter(col("foreignId") < 10L).count() === 10L)
  }
}
