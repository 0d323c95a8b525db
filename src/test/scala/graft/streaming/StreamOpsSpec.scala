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

  test("streamingTrending decays across micro-batches and matches the batch form") {
    val mem = MemoryStream[Event]
    val out = StreamOps.streamingTrending(mem.toDF())
    val q = out.writeStream.format("memory").queryName("trend")
      .outputMode("update").start()
    def dayTs(day: Int): Timestamp = new Timestamp((1700000000L + day * 86400L) * 1000L)
    val batch1 = Seq(
      Event(0, "click", 1, dayTs(0), 1.0, "{}"),
      Event(1, "click", 2, dayTs(0), 1.0, "{}"),
      Event(2, "view", 1, dayTs(1), 1.0, "{}"))
    val batch2 = Seq(
      Event(3, "click", 1, dayTs(2), 1.0, "{}"), // click frontier 0 -> 2: score halves twice
      Event(4, "view", 3, dayTs(2), 1.0, "{}"))
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val rows = spark.table("trend").collect()
        .map(r => (r.getAs[String]("etype"), r.getAs[Long]("lastDay"), r.getAs[Long]("score")))
      // latest state per type (Update mode emits one row per batch)
      val last = rows.groupBy(_._1).map { case (t, rs) => t -> rs.maxBy(_._2) }
      // click: 2 events at day 0 (2 * 2^30), frontier to day 2 (>>2), +2^30
      assert(last("click")._3 === (2L << 30 >> 2) + (1L << 30))
      // view: 1 at day 1 shifted 1 + 1 at day 2
      assert(last("view")._3 === (1L << 29) + (1L << 30))

      // batch parity: align each frontier to the global max day —
      // streamed scores must equal ev_trending on the same events
      val dir = java.nio.file.Files.createTempDirectory("graft-trend-par").toString
      (batch1 ++ batch2).map(e =>
          (e.id, e.ts, e.foreignId, e.eventType, e.value, e.metadata))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val batchScores = graft.SparkEntry.queries("ev_trending")(spark, dir)
        .collect().map(r => (r.getString(0), r.getLong(2))).toMap
      val globalMax = last.values.map(_._2).max
      last.foreach { case (t, (_, lastDay, score)) =>
        assert((score >> (globalMax - lastDay).toInt) === batchScores(t),
          s"streamed/batch divergence for $t")
      }
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

  test("streamingHeavyHitters keeps the MG guarantees across micro-batches") {
    val mem = MemoryStream[String]
    val k = 5
    val out = StreamOps.streamingHeavyHitters(mem.toDS(), k = k, shards = 1)
    val q = out.writeStream.format("memory").queryName("mghh")
      .outputMode("update").start()
    val batch1 = Seq.fill(100)("hot") ++ Seq.fill(30)("warm") ++
      (1 to 60).map(i => s"cold$i")
    val batch2 = Seq.fill(50)("hot") ++ (61 to 100).map(i => s"cold$i")
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      // Update mode re-emits the shard's candidates each batch — the
      // LAST batch's rows are the final sketch (batch 2 re-emits
      // everything still in state)
      val est = spark.table("mghh").collect()
        .groupBy(_.getAs[String]("term"))
        .map { case (t, rs) => t -> rs.map(_.getAs[Long]("est")).max }
      val all = batch1 ++ batch2
      val n = all.size.toLong
      val truth = all.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      val err = n / (k + 1)
      // candidate-superset guarantee: every term above n/(k+1) survives
      truth.filter(_._2 > err).foreach { case (t, c) =>
        assert(est.contains(t), s"heavy term $t (count $c > $err) missing")
      }
      // underestimate bound: est <= true <= est + n/(k+1), state
      // carried ACROSS batches (hot's final estimate must see both)
      est.foreach { case (t, e) =>
        assert(e <= truth(t) && truth(t) <= e + err,
          s"$t est $e outside [${truth(t) - err}, ${truth(t)}]")
      }
      assert(est("hot") >= 150L - err)
    } finally q.stop()
  }
}
