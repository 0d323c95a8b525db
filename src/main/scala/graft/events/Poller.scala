package graft.events

/** Long-poll loop with exponential backoff (reference:
  * rpatterns/poll.go — poll the stream, back off while it is idle or
  * erroring, reset to the base period on progress).
  *
  * The body is any unit of consumption that reports how many events it
  * handled — typically `Runner.runToHead(spec).consumed`. Backoff
  * doubles from `initialBackoffMs` up to `maxBackoffMs` across idle
  * polls and snaps back to the base after any productive one, the
  * standard long-poll shape for a consumer tailing a mostly-quiet log.
  */
object Poller {

  final case class PollStats(polls: Long, consumed: Long, idlePolls: Long)

  /** Poll until `stop` returns true (checked between polls).
    *
    * With a `watcher` (the wake-on-insert seam — an events table's
    * notifier, reference rsql/eventstable.go:556 passing the notifier
    * as every stream client's StreamWatcher), an idle backoff parks on
    * `awaitNotify` instead of sleeping: an insert wakes the loop
    * immediately and the backoff ladder resets, so a co-located
    * consumer pays neither wasted idle polls nor up-to-`maxBackoffMs`
    * wake latency. The epoch is captured BEFORE each poll body, so an
    * insert landing DURING the body makes the park return at once —
    * no lost wakeups. Without a watcher the behavior is the original
    * pure long-poll (sleeper semantics).
    *
    * @param body one poll; returns events consumed (0 = idle)
    * @param sleep injectable for tests (default Thread.sleep); only
    *              used when no watcher is given
    */
  def run(
      initialBackoffMs: Long = 100L,
      maxBackoffMs: Long = 10000L,
      stop: PollStats => Boolean,
      sleep: Long => Unit = Thread.sleep,
      watcher: Option[StreamWatcher] = None)(body: () => Long): PollStats = {
    require(initialBackoffMs > 0 && maxBackoffMs >= initialBackoffMs)
    var stats = PollStats(0L, 0L, 0L)
    var backoff = initialBackoffMs
    while (!stop(stats)) {
      val preEpoch = watcher.fold(0L)(_.epoch)
      val n = body()
      stats = stats.copy(
        polls = stats.polls + 1,
        consumed = stats.consumed + n,
        idlePolls = if (n == 0) stats.idlePolls + 1 else stats.idlePolls)
      if (stop(stats)) return stats
      if (n == 0) {
        watcher match {
          case Some(w) =>
            val woke = w.awaitNotify(preEpoch, backoff) > preEpoch
            // notified → new events exist: re-poll at base eagerness;
            // timeout → genuinely idle: climb the ladder as before
            backoff =
              if (woke) initialBackoffMs
              else math.min(backoff * 2, maxBackoffMs)
          case None =>
            sleep(backoff)
            backoff = math.min(backoff * 2, maxBackoffMs)
        }
      } else backoff = initialBackoffMs
    }
    stats
  }
}
