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
}
