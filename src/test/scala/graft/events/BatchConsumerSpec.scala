package graft.events

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import java.util.concurrent.{CopyOnWriteArrayList, TimeUnit}
import scala.jdk.CollectionConverters._
import graft.TestSpark

/** rpatterns/batch.go parity: flushLen and flushPeriod triggers in
  * both orders, the PARTIAL-batch cursor commit on a period flush,
  * the ErrInvalidBatchConfig / ErrBatchState protocol, and the
  * buffer-length gauge.
  */
class BatchConsumerSpec extends AnyFunSuite {

  private def ev(id: Long, tsMs: Long = System.currentTimeMillis()): Event =
    Event(id, "t", id, new Timestamp(tsMs), 1.0, "{}")

  private def await(cond: => Boolean, ms: Long = 5000L): Boolean = {
    val deadline = System.nanoTime() + ms * 1000000L
    while (!cond && System.nanoTime() < deadline) Thread.sleep(10)
    cond
  }

  test("flushLen reached first: synchronous full-length flush, remainder buffered") {
    val store = new MemCursorStore()
    val batches = new CopyOnWriteArrayList[Seq[Long]]()
    val bc = BatchConsumer("bc-len", store,
      b => { batches.add(b.map(_.id)); () },
      flushPeriodMs = 60000L, flushLen = 3)
    try {
      (1L to 5L).foreach(i => bc.enqueue(ev(i)))
      // 3rd event flushed synchronously; 4-5 still buffered
      assert(batches.asScala.toSeq === Seq(Seq(1L, 2L, 3L)))
      assert(store.get("bc-len") === Some(3L)) // acked at the LAST event
      assert(bc.bufferLength === 2)
      assert(Metrics.batchBufferLength("bc-len") === 2) // live gauge
    } finally bc.stop()
  }

  test("flushPeriod expires first: PARTIAL batch flushes async and its cursor commits") {
    val store = new MemCursorStore()
    val batches = new CopyOnWriteArrayList[Seq[Long]]()
    val bc = BatchConsumer("bc-period", store,
      b => { batches.add(b.map(_.id)); () },
      flushPeriodMs = 300L, flushLen = 10)
    try {
      bc.enqueue(ev(1L)); bc.enqueue(ev(2L)) // 2 of 10 — length never triggers
      assert(bc.bufferLength === 2)
      assert(await(store.get("bc-period").contains(2L)),
        "period flush must ack the partial batch's last event")
      assert(batches.asScala.toSeq === Seq(Seq(1L, 2L)))
      assert(bc.bufferLength === 0)
      assert(Metrics.batchBufferLength("bc-period") === 0)
    } finally bc.stop()
  }

  test("behind-stream events flush after MinWait, not a full period (batch.go:151-158)") {
    val store = new MemCursorStore()
    val bc = BatchConsumer("bc-behind", store, _ => (),
      flushPeriodMs = 60000L, flushLen = 0)
    try {
      // event timestamp a full minute in the past: ts + period is due
      // NOW, so the flush waits only the 100 ms floor
      bc.enqueue(ev(7L, System.currentTimeMillis() - 60000L))
      assert(await(store.get("bc-behind").contains(7L), ms = 3000L),
        "a behind consumer must flush at MinWait, not at ts+period")
    } finally bc.stop()
  }

  test("period-only config works; len-only config works") {
    val s1 = new MemCursorStore()
    val bcP = BatchConsumer("bc-ponly", s1, _ => (), flushPeriodMs = 200L, flushLen = 0)
    try {
      bcP.enqueue(ev(1L))
      assert(await(s1.get("bc-ponly").contains(1L)))
    } finally bcP.stop()
    val s2 = new MemCursorStore()
    val bcL = BatchConsumer("bc-lonly", s2, _ => (), flushPeriodMs = 0L, flushLen = 2)
    try {
      bcL.enqueue(ev(1L)); bcL.enqueue(ev(2L))
      assert(s2.get("bc-lonly") === Some(2L))
    } finally bcL.stop()
  }

  test("both-zero config: every enqueue reports ErrInvalidBatchConfig") {
    val bc = BatchConsumer("bc-bad", new MemCursorStore(), _ => (),
      flushPeriodMs = 0L, flushLen = 0)
    try intercept[BatchConsumer.InvalidBatchConfigException] { bc.enqueue(ev(1L)) }
    finally bc.stop()
  }

  test("synchronous flush error propagates to the enqueue caller; buffer already cleared") {
    val store = new MemCursorStore()
    val bc = BatchConsumer("bc-syncerr", store,
      _ => throw new RuntimeException("boom"),
      flushPeriodMs = 0L, flushLen = 2)
    try {
      bc.enqueue(ev(1L))
      val e = intercept[RuntimeException] { bc.enqueue(ev(2L)) }
      assert(e.getMessage === "boom")
      assert(store.get("bc-syncerr") === None) // no ack on failure
      assert(bc.bufferLength === 0) // batch cleared — stream replays from cursor
    } finally bc.stop()
  }

  test("async flush error → ErrBatchState on next enqueue; reset() clears and returns it") {
    val store = new MemCursorStore()
    @volatile var fail = true
    // period-only: the error-state probes below must never sync-flush
    val bc = BatchConsumer("bc-asyncerr", store,
      _ => if (fail) throw new RuntimeException("bg-boom"),
      flushPeriodMs = 150L, flushLen = 0)
    try {
      bc.enqueue(ev(1L))
      // wait for the background flush to fail
      assert(await(intercepted(bc), ms = 5000L), "expected error state")
      val err = bc.reset()
      assert(err.exists(_.getMessage === "bg-boom"))
      assert(store.get("bc-asyncerr") === None)
      // clean after reset: a new batch flows normally
      fail = false
      bc.enqueue(ev(5L))
      assert(await(store.get("bc-asyncerr").contains(5L)))
    } finally bc.stop()
  }

  private def intercepted(bc: BatchConsumer): Boolean =
    try { bc.enqueue(ev(99L)); false }
    catch { case _: BatchConsumer.BatchStateException => true }

  test("slow period flush overlapping a capacity flush: serialized, in-order, monotone cursor") {
    val sets = new CopyOnWriteArrayList[Long]()
    val inner = new MemCursorStore()
    val store = new CursorStore { // records every commit, in order
      def get(name: String): Option[Long] = inner.get(name)
      def set(name: String, id: Long): Unit = { sets.add(id); inner.set(name, id) }
    }
    val batches = new CopyOnWriteArrayList[Seq[Long]]()
    val started = new java.util.concurrent.CountDownLatch(1)
    val gate = new java.util.concurrent.CountDownLatch(1)
    @volatile var slowOnce = true
    val bc = BatchConsumer("bc-overlap", store, b => {
      if (slowOnce) { slowOnce = false; started.countDown()
        gate.await(5, TimeUnit.SECONDS); () }
      batches.add(b.map(_.id)); ()
    }, flushPeriodMs = 150L, flushLen = 3)
    try {
      bc.enqueue(ev(1L)); bc.enqueue(ev(2L)) // partial batch; period flush will take it
      assert(started.await(5, TimeUnit.SECONDS), "period flush never started")
      // period flush of [1,2] is now consuming (slow). A capacity flush
      // of [3,4,5] forms behind it — buffering must NOT block...
      val t = new Thread(() => { bc.enqueue(ev(3L)); bc.enqueue(ev(4L)); bc.enqueue(ev(5L)) })
      t.start()
      // ...but its DELIVERY must wait for the in-flight period flush
      Thread.sleep(250L)
      assert(batches.asScala.isEmpty, "capacity flush overtook the in-flight period flush")
      assert(sets.asScala.isEmpty, "cursor committed while first flush still in flight")
      gate.countDown()
      t.join(5000L)
      assert(await(batches.size == 2))
      assert(batches.asScala.toSeq === Seq(Seq(1L, 2L), Seq(3L, 4L, 5L)))
      assert(sets.asScala.toSeq === Seq(2L, 5L)) // monotone, never 5-then-2
      assert(store.get("bc-overlap") === Some(5L))
    } finally { gate.countDown(); bc.stop() }
  }

  test("a FAILED period flush poisons the queued capacity flush: no skip-ahead commit") {
    val store = new MemCursorStore()
    val batches = new CopyOnWriteArrayList[Seq[Long]]()
    val started = new java.util.concurrent.CountDownLatch(1)
    val gate = new java.util.concurrent.CountDownLatch(1)
    @volatile var failOnce = true
    val bc = BatchConsumer("bc-poison", store, b => {
      if (failOnce) { failOnce = false; started.countDown()
        gate.await(5, TimeUnit.SECONDS)
        throw new RuntimeException("bg-boom") }
      batches.add(b.map(_.id)); ()
    }, flushPeriodMs = 150L, flushLen = 3)
    try {
      bc.enqueue(ev(1L)); bc.enqueue(ev(2L))
      assert(started.await(5, TimeUnit.SECONDS), "period flush never started")
      // capacity flush of [3,4,5] queues behind the doomed period flush
      @volatile var thrown: Throwable = null
      val t = new Thread(() => {
        try { bc.enqueue(ev(3L)); bc.enqueue(ev(4L)); bc.enqueue(ev(5L)) }
        catch { case e: Throwable => thrown = e }
      })
      t.start()
      Thread.sleep(250L) // let the capacity flush reach the queue
      gate.countDown()   // period flush now fails
      t.join(5000L)
      // the queued batch must NOT have been consumed or committed:
      // committing 5 would permanently skip 1-2 on replay
      assert(batches.asScala.isEmpty, "poisoned batch was delivered")
      assert(store.get("bc-poison") === None, "cursor advanced past a failed batch")
      assert(thrown.isInstanceOf[BatchConsumer.BatchStateException])
      val err = bc.reset()
      assert(err.exists(_.getMessage === "bg-boom"))
    } finally { gate.countDown(); bc.stop() }
  }

  test("Runner composition: micro-batches feed enqueue; the batch store commits per flush") {
    val spark = TestSpark.spark
    val log = EventLog(spark, TestSpark.sf) // ids 0..999
    val readStore = new MemCursorStore() // the Spec's read-position store
    val ackStore = new MemCursorStore() // the BatchConsumer's PROCESSED store
    val batches = new CopyOnWriteArrayList[Int]()
    // len-only: the log's event timestamps are historical, so ANY
    // period config is instantly "behind" and would flush at MinWait
    // between micro-batches — correct behavior, wrong determinism for
    // this composition assertion (the period paths are covered above)
    val bc = BatchConsumer("bc-runner", ackStore,
      b => { batches.add(b.size); () },
      flushPeriodMs = 0L, flushLen = 400)
    try {
      val res = Runner.runToHead(Spec(log, readStore, bc.consumer, batchSize = 250))
      assert(res.consumed === 1000L)
      // 1000 events in flushes of 400: two full flushes, 200 buffered
      assert(batches.asScala.toSeq === Seq(400, 400))
      assert(ackStore.get("bc-runner") === Some(799L)) // last FLUSHED event
      assert(readStore.get("bc-runner") === Some(999L)) // read position at head
      assert(bc.bufferLength === 200)
    } finally bc.stop()
  }

  test("bridge auto-reset: BestEffort retry succeeds after a transient consume error (r16 advice)") {
    val spark = TestSpark.spark
    val log = EventLog(spark, TestSpark.sf) // ids 0..999
    val readStore = new MemCursorStore()
    val ackStore = new MemCursorStore()
    val flushes = new CopyOnWriteArrayList[Int]()
    val failOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    // flushLen == batchSize: the failed flush starts at the retried
    // batch's first id, so the replay covers it and the error clears
    val bc = BatchConsumer("bc-retry", ackStore,
      b => {
        if (failOnce.getAndSet(false)) throw new RuntimeException("transient")
        flushes.add(b.size); ()
      },
      flushPeriodMs = 0L, flushLen = 250)
    try {
      val res = Runner.runToHead(Spec(log, readStore,
        bc.consumer.copy(errorMode = BestEffort(retries = 2)), batchSize = 250))
      assert(res.consumed === 1000L && res.skipped === 0L)
      assert(flushes.asScala.toSeq === Seq(250, 250, 250, 250))
      assert(ackStore.get("bc-retry") === Some(999L))
    } finally bc.stop()
  }

  test("bridge auto-reset does NOT clear when the replay starts past the failed flush's events") {
    val spark = TestSpark.spark
    val log = EventLog(spark, TestSpark.sf)
    val readStore = new MemCursorStore()
    val ackStore = new MemCursorStore()
    val flushes = new CopyOnWriteArrayList[Int]()
    val failOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    // flushLen 500 > batchSize 250: the failing flush [0..499] holds
    // a PRIOR batch's events; retrying batch [250..499] must keep
    // aborting — a successful retry would commit the cursor past the
    // lost [0..249] and skip them forever
    val bc = BatchConsumer("bc-noclear", ackStore,
      b => {
        if (failOnce.getAndSet(false)) throw new RuntimeException("transient")
        flushes.add(b.size); ()
      },
      flushPeriodMs = 0L, flushLen = 500)
    try {
      val res = Runner.runToHead(Spec(log, readStore,
        bc.consumer.copy(errorMode = BestEffort(retries = 2)), batchSize = 250))
      // batch1 buffered fine; every later batch aborts on the poisoned
      // state (BatchStateException) and is skipped, never committed
      assert(res.consumed === 250L && res.skipped === 750L)
      assert(flushes.asScala.isEmpty)
      assert(ackStore.get("bc-noclear") === None)
    } finally bc.stop()
  }
}
