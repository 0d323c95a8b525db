package graft.events

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import java.util.concurrent.atomic.AtomicLong
import scala.concurrent.ExecutionContext
import graft.TestSpark

class RunnerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val log = EventLog(spark, TestSpark.sf) // ids 0..999

  test("runToHead consumes every event once, in batches, committing the cursor") {
    val store = new MemCursorStore()
    val seen = new AtomicLong()
    val spec = Spec(log, store, Consumer("c-all", b => { seen.addAndGet(b.count()); () }),
      batchSize = 300)
    val res = Runner.runToHead(spec)
    assert(res.consumed === 1000L)
    assert(seen.get() === 1000L)
    assert(res.batches === 4) // 300+300+300+100
    assert(res.finalCursor === 999L)
    assert(store.get("c-all") === Some(999L))
    // re-run: nothing new
    val res2 = Runner.runToHead(spec)
    assert(res2.consumed === 0L)
  }

  test("filters advance the cursor past filtered-out events (reflex semantics)") {
    val store = new MemCursorStore()
    var n = 0L
    val spec = Spec(log, store, Consumer("c-filt", b => { n += b.count(); () }),
      filter = Some(EventFilter.ofType("purchase")), batchSize = 500)
    Runner.runToHead(spec)
    assert(store.get("c-filt") === Some(999L)) // cursor at head despite filter
    assert(n > 0L && n < 1000L)
  }

  test("FailFast leaves the cursor so a re-run resumes (at-least-once)") {
    val store = new MemCursorStore()
    var calls = 0
    val failing = Consumer("c-fail", _ => {
      calls += 1
      if (calls == 2) throw new RuntimeException("boom")
    })
    val spec = Spec(log, store, failing, batchSize = 400)
    intercept[RuntimeException] { Runner.runToHead(spec) }
    // first batch committed, second failed → cursor after batch 1 only
    assert(store.get("c-fail") === Some(399L))
    // re-run completes from there, replaying the failed batch
    val res = Runner.runToHead(spec)
    assert(res.finalCursor === 999L)
    assert(store.get("c-fail") === Some(999L))
  }

  test("BestEffort skips a poison batch after retries and continues") {
    val store = new MemCursorStore()
    var attempts = 0
    val consumer = Consumer("c-be", b => {
      if (b.filter("id = 450").count() > 0) { attempts += 1; throw new RuntimeException("poison") }
    }, errorMode = BestEffort(retries = 2))
    val res = Runner.runToHead(Spec(log, store, consumer, batchSize = 300))
    assert(res.finalCursor === 999L)
    assert(attempts === 3)      // 1 + 2 retries
    assert(res.skipped === 300L)
    assert(res.consumed === 700L)
  }

  test("DeadLetter records the failure and continues") {
    val store = new MemCursorStore()
    val errors = new MemErrorStore()
    val consumer = Consumer("c-dl", b => {
      if (b.filter("id = 100").count() > 0) throw new RuntimeException("poison-100")
    }, errorMode = DeadLetter(retries = 0, errors))
    val res = Runner.runToHead(Spec(log, store, consumer, batchSize = 250))
    assert(res.finalCursor === 999L)
    val recorded = errors.list("c-dl")
    assert(recorded.size === 1)
    assert(recorded.head._2 === "poison-100")
  }

  test("runParallel shards cover all events exactly once with per-shard cursors") {
    implicit val ec: ExecutionContext = ExecutionContext.global
    val store = new MemCursorStore()
    val seen = new AtomicLong()
    val spec = Spec(log, store, Consumer("c-par", b => { seen.addAndGet(b.count()); () }),
      batchSize = 400)
    val results = Runner.runParallel(spec, 4)
    assert(seen.get() === 1000L)
    assert(results.map(_.consumed).sum === 1000L)
    (1 to 4).foreach { m => assert(store.get(s"c-par_${m}_of_4") === Some(999L)) }
  }

  test("recover function can eliminate an error (batch counts as consumed)") {
    val store = new MemCursorStore()
    var recovered = 0
    val consumer = Consumer("c-rec", b => {
      if (b.filter("id = 450").count() > 0) throw new RuntimeException("flaky")
    }, recover = Some((e, _) => { recovered += 1; None })) // swallow
    val res = Runner.runToHead(Spec(log, store, consumer, batchSize = 300))
    assert(res.finalCursor === 999L)
    assert(recovered === 1)
    assert(res.skipped === 0L) // recovered, not skipped
  }

  test("lag reports events and event-time seconds behind the head") {
    val store = new MemCursorStore(Map("c-lag" -> 499L))
    val (events, secs) = Runner.lag(log, store, "c-lag")
    assert(events === 500L)
    assert(secs > 0L)
    store.set("c-lag", 999L)
    assert(Runner.lag(log, store, "c-lag") === ((0L, 0L)))
  }

  test("AckConsumer commits exactly what the consumer acks") {
    val store = new MemCursorStore()
    val seenUpTo = new AtomicLong(-1)
    // ack only the first half of each batch — simulating partial progress
    val consumer = AckConsumer("c-ack", store, ab => {
      val ids = ab.df.select("id").collect().map(_.getLong(0))
      val mid = ids(ids.length / 2)
      ab.ack(mid)
      seenUpTo.set(mid)
    })
    // run ONE batch manually (batchSize = whole log) then inspect the ack
    val spec = Spec(log, store, consumer, batchSize = 1000)
    Runner.runToHead(spec)
    // runToHead's own commit lands at head; the mid-batch ack happened first
    assert(seenUpTo.get() === 500L)
  }

  test("noop-range cursor override skips gap-filled ranges without scanning them") {
    // log fabricated through the public test harness (graft.testkit)
    // ids 0-9 real, 10-99 noops (a filled gap), 100-109 real
    val streamer = graft.testkit.TestStreamer(spark)
    (0L until 10L).foreach(i => streamer.insertEvent(i, "click", i % 3, ts(i), 1.0, "{}"))
    (10L until 100L).foreach(i => streamer.insertEvent(i, "noop", -1L, ts(i), 0.0, "{}"))
    (100L until 110L).foreach(i => streamer.insertEvent(i, "click", i % 3, ts(i), 1.0, "{}"))
    val noopLog = streamer.log

    // the loader derives the ranges from the log itself
    val ranges = Patterns.noopRanges(noopLog.df)
    assert(ranges === Seq((10L, 99L)))

    val store = new MemCursorStore()
    var sawNoop = false
    var batchCount = 0
    val spec = Spec(noopLog, store, Consumer("c-noop", b => {
      batchCount += 1
      if (b.filter("eventType = 'noop'").count() > 0) sawNoop = true
    }), batchSize = 10, noopRanges = Some(ranges))
    val res = Runner.runToHead(spec)
    assert(res.finalCursor === 109L)
    assert(res.consumed === 20L)
    assert(!sawNoop, "consumer saw a noop event despite the cursor override")
    assert(batchCount === 2, s"expected 2 batches (range skipped), got $batchCount")
    assert(store.get("c-noop") === Some(109L))
  }

  private def ts(i: Long): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 00:${i % 60}%02d:00")

  test("consumer metrics update per batch: processed, batches, cursor") {
    Metrics.reset("c-metrics")
    val store = new MemCursorStore()
    Runner.runToHead(Spec(log, store, Consumer("c-metrics", _ => ()), batchSize = 300))
    val m = Metrics.get("c-metrics")
    assert(m.batches === 4L)
    assert(m.processed === 1000L)
    assert(m.errors === 0L)
    assert(m.skipped === 0L)
    assert(m.lastCursor === 999L)
  }

  test("activity gauge: active within TTL, inactive beyond it, negative TTL disables") {
    Metrics.reset("c-activity")
    // unknown consumer: inactive (never ticked)
    assert(!Metrics.active("c-activity", ttlMs = 60000L))
    Runner.runToHead(Spec(log, new MemCursorStore(), Consumer("c-activity", _ => ())))
    val tick = Metrics.get("c-activity").lastActivityMillis
    assert(tick > 0L)
    assert(Metrics.active("c-activity", ttlMs = 60000L))
    // beyond the TTL the gauge reports inactive (consumer stalled)
    assert(!Metrics.active("c-activity", ttlMs = 60000L, nowMs = tick + 60001L))
    // reference WithoutConsumerActivityTTL: negative TTL = always active
    assert(Metrics.active("c-activity", ttlMs = -1L, nowMs = tick + 999999999L))
  }

  test("consumer metrics count errors and skips through the retry machinery") {
    Metrics.reset("c-metrics-err")
    val consumer = Consumer("c-metrics-err", b => {
      if (b.filter("id = 450").count() > 0) throw new RuntimeException("poison")
    }, errorMode = BestEffort(retries = 1))
    Runner.runToHead(Spec(log, new MemCursorStore(), consumer, batchSize = 300))
    val m = Metrics.get("c-metrics-err")
    assert(m.errors === 2L) // first attempt + 1 retry
    assert(m.skipped === 300L)
    assert(m.processed === 700L)
    assert(m.batches === 4L)
  }

  test("cachedTail serves the same data as the cold log") {
    val hot = log.cachedTail(100)
    assert(hot.df.count() === 1000L)
    assert(hot.after(990L).count() === log.after(990L).count())
    assert(hot.head() === 999L)
  }

  test("await finds the first matching event after the cursor") {
    val first = Runner.await(log, cursor = -1L, fid = 12L, "signup")
    assert(first === Some(1L)) // known from the seeded data
    val none = Runner.await(log, cursor = 999L, fid = 12L, "signup")
    assert(none === None)
  }

  test("batchBoundaries streams lazily across id blocks with exact global ranks") {
    import spark.implicits._
    // 96 ids spread across THREE 2^20-id blocks (sparse, like a
    // gap-filled log) — forces multi-group iteration with carry-over
    // ranks between blocks
    val ids = (0 until 96).map(i => i.toLong * (1L << 15) * 3L)
    val df = ids.toDF("id")
    val head = ids.max
    val bounds = Runner.batchBoundaries(df, -1L, head, batchSize = 10,
      blocksPerGroup = 1)
    // lazy: pulling the FIRST boundary must not require later groups
    assert(bounds.hasNext)
    val sorted = ids.sorted
    val expected = (sorted.indices.collect {
      case i if (i + 1) % 10 == 0 => sorted(i)
    } :+ head).distinct
    assert(bounds.toSeq === expected)
    // every event lands in exactly one batch when consumed through them
    val store = new MemCursorStore()
    var n = 0L
    val res = Runner.runToHead(Spec(new EventLog(
      df.select(col("id"), lit("t").as("eventType"), lit(1L).as("foreignId"),
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).as("ts"),
        lit(1.0).as("value"), lit("{}").as("metadata"))),
      store, Consumer("c-bounds", b => { n += b.count(); () }), batchSize = 10))
    assert(n === 96L)
    assert(res.finalCursor === head)
  }

  test("lagPartitioned probes newest date partitions only, matching full-scan lag") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-lagpart")
      .resolve("log").toString
    val table = new graft.sources.EventsTable(spark, dir, partitionByDate = true)
    table.insert((0 until 30).map { i =>
      ("click", (i % 3).toLong,
        java.sql.Timestamp.valueOf(f"2024-01-0${i / 10 + 1}%d 00:${i % 60}%02d:00"), 1.0, "{}")
    }.toDF("eventType", "foreignId", "ts", "value", "metadata"))

    // cursor in the NEWEST partition: one-probe path
    val store = new MemCursorStore(Map("c-lp" -> 25L))
    assert(Runner.lagPartitioned(table.raw, store, "c-lp") ===
      Runner.lag(table.log, store, "c-lp"))
    // cursor in the middle partition: probes days 3, then 2, stops
    store.set("c-lp", 15L)
    assert(Runner.lagPartitioned(table.raw, store, "c-lp") ===
      Runner.lag(table.log, store, "c-lp"))
    // forgotten cursor row: monotone-id early stop, secLag 0
    table.forget(1L) // removes ids ≡ 1 mod 3, incl. 16
    store.set("c-lp", 16L)
    assert(Runner.lagPartitioned(table.raw, store, "c-lp") ===
      Runner.lag(table.log, store, "c-lp"))
    // unset cursor
    val fresh = new MemCursorStore()
    assert(Runner.lagPartitioned(table.raw, fresh, "c-none")._2 === 0L)
  }

  test("runForever consumes new events across rounds, backs off on failures, stops cleanly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-forever")
      .resolve("log").toString
    val table = new graft.sources.EventsTable(spark, dir)
    def insert(n: Int, fidBase: Long): Unit =
      table.insert((0 until n).map { i =>
        ("click", fidBase + i, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0, "{}")
      }.toDF("eventType", "foreignId", "ts", "value", "metadata"))
    insert(5, 0L)
    val store = new MemCursorStore()
    val seen = new AtomicLong()
    val failures = new AtomicLong()
    val poison = new java.util.concurrent.atomic.AtomicBoolean(false)
    val consumer = Consumer("c-forever", b => {
      if (poison.get()) { poison.set(false); throw new RuntimeException("transient") }
      seen.addAndGet(b.count()); ()
    })
    val handle = Runner.runForever(
      () => Spec(table.log, store, consumer, batchSize = 100),
      idleMs = 50L, maxBackoffMs = 200L,
      onError = (_, _) => { failures.incrementAndGet(); () })
    def waitFor(cond: => Boolean): Unit = {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!cond && System.nanoTime() < deadline) Thread.sleep(50)
      assert(cond)
    }
    try {
      waitFor(seen.get() === 5L) // first round drains to head
      insert(3, 100L) // events landing AFTER the head: picked up next round
      waitFor(seen.get() === 8L)
      // transient failure: supervisor reports it, backs off, recovers
      poison.set(true)
      insert(2, 200L)
      waitFor(seen.get() === 10L)
      assert(failures.get() >= 1L)
      // the cursor commit lands after processing — under load it can
      // trail the seen counter briefly, so wait, don't assert-once
      waitFor(store.get("c-forever") === Some(9L))
    } finally handle.stop()
    assert(!handle.isRunning)
    // stop is idempotent
    handle.stop()
  }

  test("runForever with a notifier wakes on insert without waiting out the idle park") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-notify")
      .resolve("log").toString
    val notifier = new InMemNotifier
    val table = new graft.sources.EventsTable(spark, dir, notifier = Some(notifier))
    def insert(n: Int, fidBase: Long): Unit =
      table.insert((0 until n).map { i =>
        ("click", fidBase + i, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0, "{}")
      }.toDF("eventType", "foreignId", "ts", "value", "metadata"))
    insert(2, 0L)
    val store = new MemCursorStore()
    val seen = new AtomicLong()
    val consumer = Consumer("c-notify", b => { seen.addAndGet(b.count()); () })
    // idleMs = 60 s: without the wake-on-insert seam the second batch
    // would not be seen for a minute; with it, within a poll round.
    val handle = Runner.runForever(
      () => Spec(table.log, store, consumer, batchSize = 100),
      idleMs = 60000L, maxBackoffMs = 60000L,
      watcher = Some(table.watcher))
    def waitFor(cond: => Boolean): Unit = {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!cond && System.nanoTime() < deadline) Thread.sleep(50)
      assert(cond)
    }
    try {
      waitFor(seen.get() === 2L)
      val t0 = System.nanoTime()
      insert(3, 100L) // post-commit notify must wake the parked loop
      waitFor(seen.get() === 5L)
      val wakeMs = (System.nanoTime() - t0) / 1000000L
      assert(wakeMs < 30000L,
        s"consumer took ${wakeMs}ms to see the insert — notify did not wake the 60s park")
    } finally handle.stop()
    assert(!handle.isRunning)
  }

  test("lagPartitioned detects a backdated event (id/date overlap) and falls back to exact lag") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-lagback")
      .resolve("log").toString
    val table = new graft.sources.EventsTable(spark, dir, partitionByDate = true)
    table.insert((0 until 30).map { i =>
      ("click", (i % 3).toLong,
        java.sql.Timestamp.valueOf(f"2024-01-0${i / 10 + 1}%d 00:${i % 60}%02d:00"), 1.0, "{}")
    }.toDF("eventType", "foreignId", "ts", "value", "metadata"))
    // a producer backdates ONE event: the newest id (30) lands in the
    // OLDEST date partition, breaking the id↔date monotonicity the
    // pruned probe relies on
    table.insert(Seq(("click", 0L,
      java.sql.Timestamp.valueOf("2024-01-01 23:59:00"), 1.0, "{}"))
      .toDF("eventType", "foreignId", "ts", "value", "metadata"))
    // cursor in the oldest partition forces the probe down to day 1,
    // where day1.max(id)=30 ≥ day2.min(id) trips the watchdog → the
    // exact full-scan result, not the silently under-reported one
    val store = new MemCursorStore(Map("c-bd" -> 5L))
    val full = Runner.lag(table.log, store, "c-bd")
    assert(full._1 === 25L) // true head IS the backdated id 30
    assert(Runner.lagPartitioned(table.raw, store, "c-bd") === full)
  }

  test("WithCursorSetCounter: ticks once per durable cursor write (default metric)") {
    Metrics.reset("c-csc")
    val store = CursorStore.withSetCounter(new MemCursorStore())
    val spec = Spec(log, store, Consumer("c-csc", _ => ()), batchSize = 250)
    Runner.runToHead(spec)
    assert(Metrics.get("c-csc").cursorSets === 4L) // one write per batch
    // custom counter hook (the reference's f func()) sees the same count
    var ticks = 0
    val custom = CursorStore.withSetCounter(new MemCursorStore(), _ => ticks += 1)
    Runner.runToHead(Spec(log, custom, Consumer("c-csc2", _ => ()), batchSize = 500))
    assert(ticks === 2)
  }

  test("WithErrorCounter: ticks only when an error survives recovery (consumer.go:196-200)") {
    var ticks = 0
    val counter = Some(() => { ticks += 1; () })
    // recovered error: counter must NOT tick
    val store = new MemCursorStore()
    Runner.runToHead(Spec(log, store,
      Consumer("c-ec1", _ => throw new RuntimeException("x"),
        recover = Some((_, _) => None), errorCounter = counter),
      batchSize = 1000))
    assert(ticks === 0)
    // unrecovered (passed-through) error: ticks once per failed attempt
    intercept[RuntimeException] {
      Runner.runToHead(Spec(log, new MemCursorStore(),
        Consumer("c-ec2", _ => throw new RuntimeException("y"),
          recover = Some((e, _) => Some(e)), errorCounter = counter),
        batchSize = 1000))
    }
    assert(ticks === 1)
    // no recover fn + BestEffort retries: every failed attempt ticks
    Runner.runToHead(Spec(log, new MemCursorStore(),
      Consumer("c-ec3", _ => throw new RuntimeException("z"),
        errorMode = BestEffort(retries = 2), errorCounter = counter),
      batchSize = 1000))
    assert(ticks === 1 + 3) // initial + 2 retries
  }
}
