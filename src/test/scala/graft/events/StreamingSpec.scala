package graft.events

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong
import graft.TestSpark

/** Live-tail semantics via Structured Streaming (Runner.runStream):
  * file-source event log + AvailableNow = StreamToHead; a second batch
  * of files appended later is picked up from the committed cursor.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshDirs(): (String, String) = (
    Files.createTempDirectory("graft-log").toString,
    Files.createTempDirectory("graft-ckpt").toString)

  private def writeSlice(logDir: String, lo: Long, hi: Long): Unit =
    spark.read.parquet(s"${TestSpark.sf}/events.parquet")
      .filter(col("event_id") >= lo && col("event_id") < hi)
      .write.mode(SaveMode.Append).parquet(logDir)

  test("bounded stream replay consumes the log and commits the cursor; new files resume") {
    val (logDir, ckpt) = freshDirs()
    writeSlice(logDir, 0, 600)
    val store = new MemCursorStore()
    val seen = new AtomicLong()
    val maxSeen = new AtomicLong(-1)
    val spec = Spec(null, store, Consumer("s1", b => {
      seen.addAndGet(b.count())
      val m = b.agg(max("id")).collect()(0).getLong(0)
      maxSeen.updateAndGet(x => math.max(x, m))
      ()
    }))
    val q1 = Runner.runStream(spark, logDir, spec, ckpt)
    q1.awaitTermination()
    assert(seen.get() === 600L)
    assert(store.get("s1") === Some(599L))

    // append the tail; a new AvailableNow run picks up only new events
    writeSlice(logDir, 600, 1000)
    val q2 = Runner.runStream(spark, logDir, spec, ckpt)
    q2.awaitTermination()
    assert(seen.get() === 1000L)
    assert(store.get("s1") === Some(999L))
    assert(maxSeen.get() === 999L)
  }

  test("out-of-order file delivery: smaller ids in a LATER micro-batch are never skipped") {
    // FileStreamSource orders batches by file mod-time, not id. Write
    // the HIGH-id slice first and the low-id slice a tick later, split
    // batches to one file each: the low ids arrive in a later batch
    // than the high ids. The cursor is a watermark, not a per-batch
    // filter, so every event must still be delivered exactly once.
    val (logDir, ckpt) = freshDirs()
    writeSlice(logDir, 500, 520)
    Thread.sleep(1100) // distinct mod-time second for deterministic order
    writeSlice(logDir, 0, 20)
    val store = new MemCursorStore()
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val batchMins = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val spec = Spec(null, store, Consumer("s-ooo", b => {
      val ids = b.select("id").collect().map(_.getLong(0))
      ids.foreach(seen.add(_))
      if (ids.nonEmpty) batchMins.add(ids.min)
      ()
    }))
    Runner.runStream(spark, logDir, spec, ckpt, maxFilesPerTrigger = Some(1))
      .awaitTermination()
    assert(seen.size === 40, s"delivered ${seen.size}/40 events")
    assert(((0L until 20L) ++ (500L until 520L)).forall(seen.contains),
      "an out-of-order batch was dropped")
    // cursor ends at the max delivered id (watermark semantics)
    assert(store.get("s-ooo") === Some(519L))
  }

  private def writeSliceOneFile(logDir: String, lo: Long, hi: Long): Unit =
    spark.read.parquet(s"${TestSpark.sf}/events.parquet")
      .filter(col("event_id") >= lo && col("event_id") < hi)
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(logDir)

  private def awaitCursor(store: CursorStore, name: String, want: Long): Unit = {
    val deadline = System.nanoTime() + 30_000_000_000L
    while (store.get(name) != Some(want) && System.nanoTime() < deadline)
      Thread.sleep(20)
    assert(store.get(name) === Some(want))
  }

  test("PerBatch policy: disorder freezes durable advance; graceful stop heals it") {
    // mod-time order: [500,520) → [0,20) (DISORDER) → [600,620) → [700,720).
    // After the disorder batch, later in-order batches must NOT advance
    // the durable cursor (a fresh-checkpoint restart has to replay from
    // the pre-disorder watermark); graceful termination then commits
    // max seen, because at that point everything delivered is processed.
    val (logDir, ckpt) = freshDirs()
    for ((lo, hi) <- Seq((500L, 520L), (0L, 20L), (600L, 620L), (700L, 720L))) {
      writeSliceOneFile(logDir, lo, hi)
      Thread.sleep(1100)
    }
    val store = new MemCursorStore()
    Metrics.reset("s-freeze")
    @volatile var storeAtLastBatch = -2L
    val spec = Spec(null, store, Consumer("s-freeze", b => {
      val mn = b.agg(min("id")).collect()(0).getLong(0)
      // snapshot BEFORE this batch's own commit: reflects all prior commits
      if (mn >= 700L) storeAtLastBatch = store.get("s-freeze").getOrElse(-1L)
      ()
    }))
    Runner.runStream(spark, logDir, spec, ckpt, maxFilesPerTrigger = Some(1))
      .awaitTermination()
    assert(storeAtLastBatch === 519L,
      "durable cursor advanced past the disorder point mid-run")
    assert(Metrics.get("s-freeze").disorder === 1L)
    awaitCursor(store, "s-freeze", 719L) // heal on graceful stop
  }

  test("OnStop policy: a crash before termination never moves the cursor (no skips)") {
    // Same out-of-order layout; the consumer crashes on the low-id
    // batch. Under OnStop the durable cursor is untouched, so a
    // fresh-checkpoint restart replays EVERYTHING — the at-least-once
    // guarantee holds with zero ordering assumptions on the source.
    val (logDir, ckpt) = freshDirs()
    writeSliceOneFile(logDir, 500, 520)
    Thread.sleep(1100)
    writeSliceOneFile(logDir, 0, 20)
    val store = new MemCursorStore()
    val crashing = Spec(null, store, Consumer("s-onstop", b => {
      val mn = b.agg(min("id")).collect()(0).getLong(0)
      if (mn < 500L) throw new RuntimeException("crash on the out-of-order batch")
      ()
    }))
    val q = Runner.runStream(spark, logDir, crashing, ckpt,
      maxFilesPerTrigger = Some(1), commitPolicy = Runner.CommitPolicy.OnStop)
    intercept[Exception] { q.awaitTermination() }
    assert(store.get("s-onstop").isEmpty, "crashed run must not commit under OnStop")

    // fresh checkpoint + intact store: the restart sees every event
    val ckpt2 = Files.createTempDirectory("graft-ckpt").toString
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val ok = Spec(null, store, Consumer("s-onstop", b => {
      b.select("id").collect().foreach(r => seen.add(r.getLong(0))); ()
    }))
    Runner.runStream(spark, logDir, ok, ckpt2,
      maxFilesPerTrigger = Some(1), commitPolicy = Runner.CommitPolicy.OnStop)
      .awaitTermination()
    assert(seen.size === 40, s"replay delivered ${seen.size}/40 events")
    awaitCursor(store, "s-onstop", 519L) // committed once, on graceful stop
  }

  test("materialized state table converges to latest-per-entity across incremental runs") {
    val (logDir, ckpt) = freshDirs()
    val stateDir = Files.createTempDirectory("graft-state").toString + "/state"
    writeSlice(logDir, 0, 500)
    Runner.materializeLatestState(spark, logDir, stateDir, ckpt).awaitTermination()

    // append the rest; only new events are processed, state is merged
    writeSlice(logDir, 500, 1000)
    Runner.materializeLatestState(spark, logDir, stateDir, ckpt).awaitTermination()

    val state = spark.read.parquet(stateDir)
    val expected = Patterns.latestState(
      Event.project(spark.read.parquet(s"${TestSpark.sf}/events.parquet")))
    assert(state.count() === expected.count())
    val got = state.select("foreignId", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    expected.select("foreignId", "id").collect().foreach { r =>
      assert(got(r.getLong(0)) === r.getLong(1))
    }
  }

  test("stream-side filter applies before the consumer") {
    val (logDir, ckpt) = freshDirs()
    writeSlice(logDir, 0, 300)
    val store = new MemCursorStore()
    val seen = new AtomicLong()
    val spec = Spec(null, store, Consumer("s2", b => { seen.addAndGet(b.count()); () }),
      filter = Some(EventFilter.ofType("purchase")))
    Runner.runStream(spark, logDir, spec, ckpt).awaitTermination()
    val expected = spark.read.parquet(s"${TestSpark.sf}/events.parquet")
      .filter(col("event_id") < 300 && col("event_type") === "purchase").count()
    assert(seen.get() === expected)
  }
}
