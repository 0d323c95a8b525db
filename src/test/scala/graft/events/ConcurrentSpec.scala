package graft.events

import org.scalatest.funsuite.AnyFunSuite
import java.util.concurrent.{ConcurrentHashMap, CountDownLatch, TimeUnit}
import scala.util.Random
import graft.TestSpark

class ConcurrentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // built through the public test harness (graft.testkit.TestStreamer,
  // the reference's testmock/stream.go surface) — the documented way
  // downstream code fabricates an event stream in tests
  private def smallLog(n: Int): EventLog = {
    val ts = graft.testkit.TestStreamer(spark)
    (0 until n).foreach { i =>
      ts.insertEvent(i.toLong, "click", (i % 3).toLong,
        java.sql.Timestamp.valueOf(f"2024-01-01 00:${i % 60}%02d:00"), 1.0, "{}")
    }
    ts.log
  }

  test("GapSequence: cursor is the max contiguous completed id (random completion order)") {
    val rnd = new Random(42)
    for (_ <- 1 to 20) {
      val n = 30
      val gs = new GapSequence(-1L)
      val order = rnd.shuffle((0 until n).toList)
      val done = scala.collection.mutable.Set.empty[Int]
      (0 until n).foreach(i => gs.doing(i.toLong))
      order.foreach { i =>
        gs.done(i.toLong)
        done += i
        // model: the largest prefix 0..k fully contained in `done`
        val model = Iterator.from(0).takeWhile(done.contains).size - 1
        assert(gs.currentMax === model.toLong)
      }
      assert(gs.currentMax === (n - 1).toLong)
    }
  }

  test("out-of-order completion never advances the cursor past an in-flight event") {
    val store = new MemCursorStore()
    val log = smallLog(10)
    val blocker = new CountDownLatch(1)
    val laterDone = new CountDownLatch(3) // ids 6,7,8 completing while 5 blocks
    val completed = ConcurrentHashMap.newKeySet[Long]()

    val runFut = scala.concurrent.Future {
      ConcurrentRunner.run(log, store, EventConsumer("conc", { e =>
        if (e.id == 5L) assert(blocker.await(60, TimeUnit.SECONDS))
        completed.add(e.id)
        if (e.id > 5L) laterDone.countDown()
      }), maxInFlight = 4)
    }(scala.concurrent.ExecutionContext.global)

    // wait until events AFTER the blocked one have completed
    assert(laterDone.await(60, TimeUnit.SECONDS))
    assert(completed.contains(6L) && !completed.contains(5L))
    // wait for ids 0..4 to finish (they're unblocked, just async)
    val deadline = System.nanoTime() + 10_000_000_000L
    while (store.get("conc").getOrElse(-1L) < 4L && System.nanoTime() < deadline)
      Thread.sleep(10)
    // the concurrent_test.go property: cursor parked BEFORE the
    // in-flight event even though later ids are done
    assert(store.get("conc").getOrElse(-1L) === 4L)

    blocker.countDown()
    val res = scala.concurrent.Await.result(runFut, scala.concurrent.duration.Duration(120, "s"))
    assert(res.consumed === 10L)
    assert(res.finalCursor === 9L)
    assert(store.get("conc") === Some(9L))
  }

  test("a failed event halts cursor advance at the last contiguous success") {
    val store = new MemCursorStore()
    val log = smallLog(12)
    val err = intercept[RuntimeException] {
      ConcurrentRunner.run(log, store, EventConsumer("conc-err", { e =>
        if (e.id == 7L) throw new RuntimeException("boom-7")
      }), maxInFlight = 3)
    }
    assert(err.getMessage === "boom-7")
    // everything before 7 committed; nothing at/after 7 ever commits
    assert(store.get("conc-err").getOrElse(-1L) <= 6L)
    // re-run (7 fixed) completes from the committed cursor
    val res = ConcurrentRunner.run(log, store, EventConsumer("conc-err", _ => ()), maxInFlight = 3)
    assert(res.finalCursor === 11L)
  }

  test("resumes from the stored cursor and applies filters") {
    val store = new MemCursorStore(Map("conc-f" -> 4L))
    val log = smallLog(10)
    val seen = ConcurrentHashMap.newKeySet[Long]()
    val res = ConcurrentRunner.run(log, store, EventConsumer("conc-f", e => { seen.add(e.id); () }),
      maxInFlight = 2, filter = Some(EventFilter.foreignId(0L)))
    // only fids ≡ 0 (ids 6, 9 among 5..9) are delivered…
    assert(seen.contains(6L) && seen.contains(9L) && !seen.contains(5L))
    // …but the cursor still reaches the head (filters advance cursors)
    assert(res.finalCursor === 9L)
  }
}
