package graft.events

/** Wake-on-insert notifications (reference: rsql/eventstable.go:507-570
  * — `EventsNotifier` / `StreamWatcher` / `inmemNotifier`): a consumer
  * co-located with the writer skips the idle-backoff sleep entirely —
  * the writer's post-commit `Notify()` wakes every parked stream loop.
  *
  * JVM shape: the Go version hands each stream client a fresh one-shot
  * channel and gets lost-wakeup safety by re-registering before every
  * head check. Here the same guarantee uses a monotone epoch instead
  * of re-registration: capture `epoch` BEFORE running the poll body,
  * then park with `awaitNotify(since = captured, timeoutMs)` — a
  * notify that lands while the body was running makes the wait return
  * immediately, so an insert can never fall between "saw nothing new"
  * and "went to sleep". The timeout keeps the poll loop as a fallback
  * for writers that do not notify (a remote process appending to the
  * same log), exactly the hybrid the reference runs: notifier when
  * co-located, long-poll otherwise.
  *
  * Scale note: this is driver/control-plane machinery (one JVM's
  * consumers waking on one JVM's inserts — the reference's notifier is
  * likewise per-process). The distributed data path is unchanged; what
  * the notifier removes is wasted idle polls and up-to-`maxBackoffMs`
  * of wake latency on the serving/consuming loops.
  */
trait StreamWatcher {

  /** Current notification epoch — capture BEFORE the poll body runs. */
  def epoch: Long

  /** Park until `epoch > since` or `timeoutMs` elapses (whichever is
    * first); returns the epoch at wake. `since` older than the current
    * epoch returns immediately — that is the lost-wakeup guard.
    */
  def awaitNotify(since: Long, timeoutMs: Long): Long
}

/** The writer-side half (rsql/eventstable.go:555 `EventsNotifier`
  * embeds `StreamWatcher`): `notifyInsert()` is called by the events
  * table after each committed insert.
  */
trait EventsNotifier extends StreamWatcher {
  def notifyInsert(): Unit
}

/** In-memory notifier (rsql/eventstable.go:524 `inmemNotifier`,
  * enabled there via `WithEventsInMemNotifier`). One lock, one long;
  * `notifyAll` because every parked consumer must re-check the log —
  * the reference signals every registered listener channel the same
  * way.
  */
final class InMemNotifier extends EventsNotifier {
  private[this] val lock = new Object
  private[this] var e = 0L

  def epoch: Long = lock.synchronized(e)

  def notifyInsert(): Unit = lock.synchronized { e += 1; lock.notifyAll() }

  def awaitNotify(since: Long, timeoutMs: Long): Long = lock.synchronized {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (e <= since) {
      val leftMs = (deadline - System.nanoTime()) / 1000000L
      if (leftMs <= 0L) return e
      lock.wait(leftMs)
    }
    e
  }
}

object StreamWatcher {

  /** No-notifier fallback: always sleeps out the full timeout — the
    * plain long-poll behavior every loop had before the seam existed
    * (reference stubNotifier, rsql/eventstable.go:512).
    */
  val sleeper: StreamWatcher = new StreamWatcher {
    def epoch: Long = 0L
    def awaitNotify(since: Long, timeoutMs: Long): Long = {
      Thread.sleep(timeoutMs); 0L
    }
  }
}
