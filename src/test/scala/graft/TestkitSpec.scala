package graft

import org.scalatest.funsuite.AnyFunSuite
import java.util.concurrent.atomic.AtomicLong
import graft.events.{Consumer, Runner, Spec}
import graft.testkit.TestStreamer

/** The public test harness surface (reference: testmock/stream.go
  * NewTestStreamer + testmock/await.go AwaitConsumer + the CursorStore
  * mock): insert events — before OR after a consumer starts — stream
  * them through the real Runner, await cursors across threads.
  */
class TestkitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("insert-then-stream: a consumer drains the fabricated log through the real Runner") {
    val ts = TestStreamer(spark)
    (0L until 7L).foreach(i => ts.insertEvent(i, if (i % 2 == 0) "click" else "buy", i % 3))
    val store = TestStreamer.memCursorStore()
    val seen = new AtomicLong()
    val res = Runner.runToHead(Spec(ts.log, store,
      Consumer("tk-basic", b => { seen.addAndGet(b.count()); () }), batchSize = 3))
    assert(res.consumed === 7L)
    assert(seen.get() === 7L)
    assert(store.get("tk-basic") === Some(6L))
    assert(ts.head === 6L)
  }

  test("inserts after a view was taken appear in the NEXT view (StreamFunc re-query contract)") {
    val ts = TestStreamer(spark)
    ts.insertEvent(0L, "click", 1L)
    val before = ts.log
    ts.insertEvent(1L, "click", 2L)
    assert(before.head() === 0L) // snapshot view: stable
    assert(ts.streamFunc().head() === 1L) // fresh view: sees the insert
  }

  test("seeded cursor store starts a consumer mid-stream (WithMemCursor)") {
    val ts = TestStreamer(spark)
    (0L until 10L).foreach(i => ts.insertEvent(i, "click", 1L))
    val store = TestStreamer.memCursorStore(Map("tk-mid" -> 6L))
    var ids = Seq.empty[Long]
    Runner.runToHead(Spec(ts.log, store,
      Consumer("tk-mid", b => { ids ++= b.select("id").collect().map(_.getLong(0)) })))
    assert(ids === Seq(7L, 8L, 9L))
  }

  test("awaitConsumer unblocks when the cursor reaches the event id, times out otherwise") {
    val ts = TestStreamer(spark)
    (0L until 5L).foreach(i => ts.insertEvent(i, "click", 1L))
    val store = TestStreamer.memCursorStore()
    // a background consumer, as downstream service tests run them
    val handle = Runner.runForever(
      () => Spec(ts.log, store, Consumer("tk-await", _ => ())),
      idleMs = 60000L, maxBackoffMs = 60000L, watcher = Some(ts.watcher))
    try {
      TestStreamer.awaitConsumer(store, "tk-await", 4L)
      // live insert: the streamer's notifier wakes the 60s-parked loop
      ts.insertEvent(5L, "tail", 2L)
      TestStreamer.awaitConsumer(store, "tk-await", 5L)
    } finally handle.stop()
    val timedOut = intercept[AssertionError] {
      TestStreamer.awaitConsumer(store, "tk-await", 99L, timeoutMs = 300L)
    }
    assert(timedOut.getMessage.contains("tk-await"))
  }
}
