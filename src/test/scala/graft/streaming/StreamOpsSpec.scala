package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import graft.TestSpark
import graft.events.Event

class StreamOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private def ev(id: Long, t: String, fid: Long, minute: Int): Event =
    Event(id, t, fid, ts(minute), 1.0, "{}")

  test("windowed counts with watermark aggregate per tumbling window") {
    val mem = MemoryStream[Event]
    val out = StreamOps.windowedCounts(mem.toDF(), windowLen = "1 hour", lateness = "10 minutes")
    val q = out.writeStream.format("memory").queryName("wc")
      .outputMode("update").start()
    try {
      mem.addData(ev(0, "click", 1, 5), ev(1, "click", 2, 20), ev(2, "view", 1, 70))
      q.processAllAvailable()
      val rows = spark.table("wc").collect()
      val clicks = rows.filter(_.getAs[String]("eventType") == "click")
      assert(clicks.map(_.getAs[Long]("n")).sum === 2)
      val views = rows.filter(_.getAs[String]("eventType") == "view")
      assert(views.length === 1)
      // the view event landed in the second hour's window
      assert(views.head.getAs[Timestamp]("win_start") === ts(60))
    } finally q.stop()
  }

  test("session windows split on the gap") {
    val mem = MemoryStream[Event]
    val out = StreamOps.sessionAgg(mem.toDF(), gap = "30 minutes", lateness = "5 minutes")
    val q = out.writeStream.format("memory").queryName("sess")
      .outputMode("complete").start()
    try {
      // user 1: events at 0 and 10 (one session), then 120 (a new session)
      mem.addData(ev(0, "click", 1, 0), ev(1, "click", 1, 10), ev(2, "click", 1, 120))
      q.processAllAvailable()
      val rows = spark.table("sess").filter(col("foreignId") === 1).collect()
      assert(rows.length === 2)
      assert(rows.map(_.getAs[Long]("n_events")).sorted.toSeq === Seq(1L, 2L))
    } finally q.stop()
  }

  test("stream-stream interval join matches events for the same entity in the window") {
    val views = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val out = StreamOps.joinWithin(purchases.toDF(), views.toDF(), withinSeconds = 3600)
    val q = out.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    try {
      views.addData(ev(0, "view", 1, 0), ev(1, "view", 2, 0))
      purchases.addData(
        ev(10, "purchase", 1, 30),   // within the hour of view 0 → match
        ev(11, "purchase", 1, 90),   // 90 min after → no match
        ev(12, "purchase", 3, 30))   // no view for user 3 → no match
      q.processAllAvailable()
      val rows = spark.table("ssj").select("l_id", "r_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows === Set((10L, 0L)))
    } finally q.stop()
  }

  test("exactlyOnceIds drops redelivered duplicates within the watermark") {
    val mem = MemoryStream[Event]
    val out = StreamOps.exactlyOnceIds(mem.toDF(), lateness = "1 hour")
    val q = out.writeStream.format("memory").queryName("eo")
      .outputMode("append").start()
    try {
      mem.addData(ev(0, "click", 1, 0), ev(1, "click", 1, 1))
      q.processAllAvailable()
      // redelivery of id 1 plus a new event
      mem.addData(ev(1, "click", 1, 1), ev(2, "view", 1, 2))
      q.processAllAvailable()
      val ids = spark.table("eo").select("id").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq === Seq(0L, 1L, 2L))
    } finally q.stop()
  }

  test("mapGroupsWithState keeps running per-user counters across batches") {
    val mem = MemoryStream[Event]
    val out = StreamOps.runningUserState(mem.toDS())
    val q = out.writeStream.format("memory").queryName("ustate")
      .outputMode("update").start()
    try {
      mem.addData(ev(0, "signup", 7, 0), ev(1, "click", 7, 1))
      q.processAllAvailable()
      mem.addData(ev(2, "purchase", 7, 2))
      q.processAllAvailable()
      val last = spark.table("ustate").filter(col("foreignId") === 7)
        .orderBy(col("nEvents").desc).collect().head
      assert(last.getAs[Long]("nEvents") === 3L)
      assert(last.getAs[Long]("lastId") === 2L)
      assert(last.getAs[String]("lastType") === "purchase")
    } finally q.stop()
  }

  test("streamingSeqPack: pack fill carries across micro-batches per shard") {
    val mem = MemoryStream[(Long, Long)]
    // 2 shards (docId % 2), budget 100
    val out = StreamOps.streamingSeqPack(mem.toDS(), budget = 100L, nShards = 2)
    val q = out.writeStream.format("memory").queryName("seqpack")
      .outputMode("append").start()
    try {
      // batch 1: shard 0 gets 60+30 (fits in pack 0), shard 1 gets 90
      mem.addData((0L, 60L), (2L, 30L), (1L, 90L))
      q.processAllAvailable()
      // batch 2: shard 0's 20 overflows 90+20>100 -> pack 1 (STATE
      // carried the fill); shard 1's 5 still fits its pack 0
      mem.addData((4L, 20L), (3L, 5L))
      q.processAllAvailable()
      val rows = spark.table("seqpack").collect()
        .map(r => (r.getAs[Long]("docId"), r.getAs[Long]("shard"), r.getAs[Long]("packId")))
        .sortBy(_._1)
      assert(rows.toSeq === Seq((0L, 0L, 0L), (1L, 1L, 0L), (2L, 0L, 0L),
        (3L, 1L, 0L), (4L, 0L, 1L)))

      // batch 3: an oversized doc opens (and exhausts) its own pack
      mem.addData((6L, 500L), (8L, 10L))
      q.processAllAvailable()
      val later = spark.table("seqpack").collect()
        .map(r => (r.getAs[Long]("docId"), r.getAs[Long]("packId"))).toMap
      assert(later(6L) === 2L) // new pack for the oversized doc
      assert(later(8L) === 3L) // next doc cannot share it
    } finally q.stop()
  }
}
