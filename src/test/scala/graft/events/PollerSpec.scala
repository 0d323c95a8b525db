package graft.events

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

/** rpatterns/poll.go semantics: exponential backoff while idle,
  * capped at the max, reset on progress.
  */
class PollerSpec extends AnyFunSuite {

  test("backoff doubles while idle, caps at max, resets on progress") {
    val sleeps = ArrayBuffer.empty[Long]
    // poll script: 3 idle, productive, 5 idle, productive, stop
    val script = Iterator(0L, 0L, 0L, 7L, 0L, 0L, 0L, 0L, 0L, 3L)
    val stats = Poller.run(
      initialBackoffMs = 100L, maxBackoffMs = 800L,
      stop = s => s.polls >= 10, sleep = sleeps += _)(() => script.next())
    assert(stats.polls === 10L)
    assert(stats.consumed === 10L)
    assert(stats.idlePolls === 8L)
    // idle streak 1: 100, 200, 400; productive poll sleeps nothing and
    // resets; idle streak 2: 100, 200, 400, 800 (cap), 800
    assert(sleeps.toSeq === Seq(100L, 200L, 400L, 100L, 200L, 400L, 800L, 800L))
  }

  test("stop predicate halts without an extra sleep") {
    var calls = 0
    val stats = Poller.run(stop = s => s.consumed >= 5, sleep = _ => fail("must not sleep"))(
      () => { calls += 1; 5L })
    assert(calls === 1)
    assert(stats.consumed === 5L)
  }

  test("watcher wakes an idle poller on insert without waiting out the backoff") {
    // reference rsql/eventstable.go:524 inmemNotifier: a consumer parked
    // at the head wakes the moment Notify() fires — not maxBackoffMs
    // later. The poller would park for 60 s here; the test passes in
    // milliseconds only if the notify actually wakes it.
    val n = new InMemNotifier
    @volatile var available = 0L
    val t0 = System.nanoTime()
    val notifyAt = new java.util.concurrent.CountDownLatch(1)
    val inserter = new Thread(() => {
      notifyAt.await()
      available = 3L
      n.notifyInsert()
    })
    inserter.start()
    val stats = Poller.run(
      initialBackoffMs = 60000L, maxBackoffMs = 60000L,
      stop = s => s.consumed >= 3,
      sleep = _ => fail("watcher present: must never fall back to sleep"),
      watcher = Some(n))(() => {
      val got = available; available = 0L
      if (got == 0L) notifyAt.countDown() // first idle poll: release the insert
      got
    })
    inserter.join()
    val elapsedMs = (System.nanoTime() - t0) / 1000000L
    assert(stats.consumed === 3L)
    // one idle poll (which triggered the insert), one productive wake —
    // zero wasted polls and nowhere near the 60 s backoff
    assert(stats.polls === 2L)
    assert(stats.idlePolls === 1L)
    assert(elapsedMs < 10000L, s"wake took ${elapsedMs}ms — notify did not short-circuit the park")
  }

  test("no lost wakeup: an insert DURING the poll body makes the park return at once") {
    val n = new InMemNotifier
    var polls = 0
    val stats = Poller.run(
      initialBackoffMs = 60000L, maxBackoffMs = 60000L,
      stop = s => s.polls >= 2,
      watcher = Some(n))(() => {
      polls += 1
      // insert lands while the body is running (after the epoch was
      // captured): the subsequent park must return immediately
      if (polls == 1) { n.notifyInsert(); 0L } else 1L
    })
    assert(stats.polls === 2L)
    assert(stats.consumed === 1L)
  }
}
